"""Checkpointing: atomic orbax save/restore with mid-run resume, plus a
PyTorch ``.pth`` import shim for reference checkpoints.

Upgrades over the reference (SURVEY.md §5): the reference writes one raw
``.pth`` per model per epoch with no atomicity and no mid-epoch resume
(`/root/reference/trainer.py:778-823`); here the whole TrainState (params, BN
stats, Adam moments, step counter) is one atomic orbax checkpoint, and
``latest_step``/``restore`` give crash-safe resume.

The import shim maps reference state_dicts onto our Flax trees so numeric
parity can be checked model-by-model (SURVEY.md §7 step 2):
  * conv weight (O, I, kh, kw) -> (kh, kw, I, O)
  * transposed conv (I, O, kh, kw) -> (kh, kw, O, I) (see models.layers.Deconv2x)
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import jax.flatten_util  # noqa: F401  (ravel_pytree for moment migration)
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState

# ---------------------------------------------------------------------------
# orbax save / restore
# ---------------------------------------------------------------------------


def _manager(directory: str, keep: int = 10) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                             create=True))


def save_checkpoint(directory: str, state: TrainState, cfg=None,
                    keep: int = 10, wait: bool = True):
    mgr = _manager(directory, keep)
    step = int(state.step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    if cfg is not None:
        # opt.json analogue (trainer.py:767-776)
        with open(os.path.join(directory, "opt.json"), "w") as f:
            f.write(cfg.to_json())
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, target: TrainState,
                       step: Optional[int] = None) -> TrainState:
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    except Exception as err:
        # Adam-moment layout migration: optax.flatten (the fsdp==1 perf
        # default since r2, state.py make_optimizer) stores mu/nu as ONE
        # raveled vector; per-leaf trees otherwise. A checkpoint written
        # with the other layout fails StandardRestore on tree structure —
        # restore it against the alternate template and re(un)flatten
        # instead of bricking the resume (ADVICE r2 #1 residue).
        alt = _alternate_moment_template(target)
        if alt is None:
            mgr.close()
            raise
        try:
            restored_alt = mgr.restore(
                step, args=ocp.args.StandardRestore(
                    target.replace(opt_state=alt)))
        except Exception:
            mgr.close()
            raise err from None
        restored = restored_alt.replace(opt_state=_convert_moments(
            restored_alt.opt_state, target.opt_state, target.params))
        print(f"restore_checkpoint: migrated Adam moments to the "
              f"{'flattened' if _is_flat_moments(target.opt_state) else 'per-leaf'} "
              f"layout of this run")
    mgr.close()
    return restored


def _adam_states(opt_state):
    """Yield every namedtuple node holding mu/nu fields (the Adam moments),
    depth-first through the optax state tuple."""
    if hasattr(opt_state, "_fields"):
        if "mu" in opt_state._fields and "nu" in opt_state._fields:
            yield opt_state
        return
    if isinstance(opt_state, (tuple, list)):
        for node in opt_state:
            yield from _adam_states(node)


def _is_flat_moments(opt_state) -> bool:
    for adam in _adam_states(opt_state):
        leaves = jax.tree_util.tree_leaves(adam.mu)
        return len(leaves) == 1 and leaves[0].ndim == 1
    return False


def _map_adam(opt_state, fn):
    """Rebuild the optax state tuple with ``fn(adam_namedtuple)`` applied to
    each mu/nu-holding node."""
    if hasattr(opt_state, "_fields"):
        if "mu" in opt_state._fields and "nu" in opt_state._fields:
            return fn(opt_state)
        return opt_state
    if isinstance(opt_state, tuple):
        # plain tuple (optax chain state): tuple() takes ONE iterable —
        # namedtuples were already handled above
        return tuple(_map_adam(n, fn) for n in opt_state)
    if isinstance(opt_state, list):
        return [_map_adam(n, fn) for n in opt_state]
    return opt_state


def _alternate_moment_template(target: TrainState):
    """Target's opt_state with the OTHER moment layout (flat <-> per-leaf),
    zero-initialized; None when there is no Adam state to toggle."""
    import jax.numpy as jnp

    if not any(True for _ in _adam_states(target.opt_state)):
        return None
    if _is_flat_moments(target.opt_state):
        tree = jax.tree_util.tree_map(jnp.zeros_like, target.params)
        return _map_adam(target.opt_state,
                         lambda a: a._replace(mu=tree, nu=tree))
    flat, _ = jax.flatten_util.ravel_pytree(
        jax.tree_util.tree_map(jnp.zeros_like, target.params))
    return _map_adam(target.opt_state,
                     lambda a: a._replace(mu=flat, nu=flat))


def _convert_moments(restored_opt, target_opt, params):
    """Convert restored Adam moments to the target layout. optax.flatten
    lays the vector out in jax.flatten_util.ravel_pytree order over the
    params tree, so ravel/unravel against params is exact."""
    import jax.numpy as jnp

    to_flat = _is_flat_moments(target_opt)
    _, unravel = jax.flatten_util.ravel_pytree(
        jax.tree_util.tree_map(jnp.zeros_like, params))

    def convert(a):
        if to_flat:
            return a._replace(
                mu=jax.flatten_util.ravel_pytree(a.mu)[0],
                nu=jax.flatten_util.ravel_pytree(a.nu)[0])
        return a._replace(mu=unravel(a.mu), nu=unravel(a.nu))

    return _map_adam(restored_opt, convert)


# ---------------------------------------------------------------------------
# PyTorch .pth import shim
# ---------------------------------------------------------------------------


def _load_pth(path: str) -> Dict[str, np.ndarray]:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for k, v in raw.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().numpy()
        else:
            out[k] = v  # height/width/use_stereo metadata ints
    return out


def _conv_w(v):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return np.transpose(v, (2, 3, 1, 0))


def _deconv_w(v):  # torch transposed-conv (I, O, kh, kw) -> (kh, kw, O, I)
    return np.transpose(v, (2, 3, 1, 0))


def _bn(sd, prefix):
    return (
        {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]},
        {"mean": sd[prefix + ".running_mean"],
         "var": sd[prefix + ".running_var"]},
    )


def import_resnet_encoder(path: str, num_layers: int = 18
                          ) -> Dict[str, Dict[str, Any]]:
    """Reference encoder ``.pth`` -> {'params', 'batch_stats', 'meta'}.

    Key layout per torchvision resnet wrapped under ``encoder.`` as saved by
    `/root/reference/trainer.py:785-793`.
    """
    sd = _load_pth(path)
    meta = {k: sd.pop(k) for k in ("height", "width", "use_stereo")
            if k in sd}
    params, stats = _resnet_tree(sd, num_layers)
    return {"params": params, "batch_stats": stats, "meta": meta}


def _resnet_tree(sd: Dict[str, np.ndarray], num_layers: int):
    """``encoder.``-prefixed torchvision-layout resnet state_dict ->
    (flax params, batch_stats)."""
    pre = "encoder."
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _bn(sd, pre + "bn1")
    params["stem"] = {"conv": {"kernel": _conv_w(sd[pre + "conv1.weight"])},
                      "bn": p}
    stats["stem"] = {"bn": s}

    bottleneck = num_layers in (50, 101, 152)
    n_convs = 3 if bottleneck else 2
    for key in list(sd):
        m = re.match(r"encoder\.layer(\d)\.(\d+)\.(.+)", key)
        if not m:
            continue
        stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        name = f"layer{stage}_{block}"
        params.setdefault(name, {})
        stats.setdefault(name, {})
        for ci in range(1, n_convs + 1):
            if rest == f"conv{ci}.weight":
                params[name].setdefault(f"cb{ci}", {})["conv"] = {
                    "kernel": _conv_w(sd[key])}
            elif rest.startswith(f"bn{ci}."):
                if f"bn" in params[name].get(f"cb{ci}", {}):
                    continue
                p, s = _bn(sd, f"encoder.layer{stage}.{block}.bn{ci}")
                params[name].setdefault(f"cb{ci}", {})["bn"] = p
                stats[name][f"cb{ci}"] = {"bn": s}
        if rest == "downsample.0.weight":
            params[name].setdefault("down", {})["conv"] = {
                "kernel": _conv_w(sd[key])}
        elif rest.startswith("downsample.1."):
            if "bn" not in params[name].get("down", {}):
                p, s = _bn(sd, f"encoder.layer{stage}.{block}.downsample.1")
                params[name].setdefault("down", {})["bn"] = p
                stats[name]["down"] = {"bn": s}
    return params, stats


# torchvision IMAGENET1K_V1 weight files (the zoo the reference pulls via
# model_zoo at /root/reference/networks/resnet_encoder.py:56,90)
IMAGENET_RESNET_URLS = {
    18: "https://download.pytorch.org/models/resnet18-f37072fd.pth",
    34: "https://download.pytorch.org/models/resnet34-b627a593.pth",
    50: "https://download.pytorch.org/models/resnet50-0676ba61.pth",
    101: "https://download.pytorch.org/models/resnet101-63fe2227.pth",
    152: "https://download.pytorch.org/models/resnet152-394f9c45.pth",
}


def import_torchvision_resnet(path_or_sd, num_layers: int = 18,
                              num_input_images: int = 1
                              ) -> Dict[str, Dict[str, Any]]:
    """UN-prefixed torchvision resnet ``.pth`` (the ImageNet zoo layout) ->
    flax tree, including the multi-image conv1 weight averaging of the
    reference (`/root/reference/networks/resnet_encoder.py:56-59`: tile the
    RGB kernel across the stacked frames and divide by their count)."""
    sd = path_or_sd if isinstance(path_or_sd, dict) else _load_pth(path_or_sd)
    sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
    if num_input_images > 1:
        w = sd["conv1.weight"]
        sd["conv1.weight"] = np.concatenate(
            [w] * num_input_images, axis=1) / num_input_images
    sd = {f"encoder.{k}": v for k, v in sd.items()}
    params, stats = _resnet_tree(sd, num_layers)
    return {"params": params, "batch_stats": stats}


def locate_imagenet_weights(num_layers: int = 18,
                            explicit: Optional[str] = None) -> str:
    """-> path to a torchvision ImageNet resnet ``.pth``: the explicit
    ``--imagenet_weights`` flag, the torch hub cache, or a fresh download.
    Raises an actionable FileNotFoundError when none is reachable."""
    import glob

    if explicit:
        path = os.path.expanduser(explicit)
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"--imagenet_weights {explicit} does not exist")
        return path

    if num_layers not in IMAGENET_RESNET_URLS:
        raise ValueError(f"no ImageNet zoo entry for resnet{num_layers}")
    url = IMAGENET_RESNET_URLS[num_layers]
    torch_home = os.path.expanduser(
        os.environ.get("TORCH_HOME", "~/.cache/torch"))
    cache_dir = os.path.join(torch_home, "hub", "checkpoints")
    cached = os.path.join(cache_dir, os.path.basename(url))
    if os.path.isfile(cached):
        return cached
    hits = sorted(glob.glob(os.path.join(cache_dir,
                                         f"resnet{num_layers}-*.pth")))
    if hits:
        return hits[0]
    try:
        import torch

        torch.hub.load_state_dict_from_url(url, map_location="cpu")
    except Exception as err:
        raise FileNotFoundError(
            f"weights_init=pretrained needs the torchvision ImageNet "
            f"resnet{num_layers} weights, and neither the torch hub cache "
            f"({cache_dir}) nor a download ({url}) is available in this "
            f"environment. Either place the file and pass "
            f"--imagenet_weights <path>, or train from random init with "
            f"--weights_init scratch.") from err
    return cached


def import_depth_decoder(path: str, scales=(0, 1, 2, 3), variant="auto"
                         ) -> Dict[str, Dict[str, Any]]:
    """Reference DepthDecoder ``.pth`` -> Flax tree.

    Handles both the fork layout (ModuleList ``decoder.N`` ordering per
    `/root/reference/networks/depth_decoder.py:32-56`: 5 deconvs, then 10
    upconvs, then dispconvs; BN was never checkpointed — defect §8.3, so BN
    stays at init) and the upstream monodepth2 layout (10 upconvs then
    dispconvs, no deconvs).
    """
    sd = _load_pth(path)
    if variant == "auto":
        # fork decoders start their ModuleList with bare ConvTranspose2d
        # entries (key `decoder.0.weight`, depth_decoder.py:33); upstream
        # starts with a ConvBlock (`decoder.0.conv.conv.weight`).
        variant = "fork" if "decoder.0.weight" in sd else "upstream"

    params: Dict[str, Any] = {}

    def conv3x3(i):
        return {"conv3x3": {"conv": {
            "kernel": _conv_w(sd[f"decoder.{i}.conv.conv.weight"]),
            "bias": sd[f"decoder.{i}.conv.conv.bias"]}}}

    if variant == "fork":
        # order built at depth_decoder.py:30-56: deconv i=4..0 (bare
        # ConvTranspose2d modules), upconv (i,0) and (i,1) for i=4..0,
        # dispconv per scale
        for j, i in enumerate(range(4, -1, -1)):
            params[f"deconv_{i}"] = {
                "kernel": _deconv_w(sd[f"decoder.{j}.weight"]),
                "bias": sd[f"decoder.{j}.bias"]}
        base = 5
        for j, i in enumerate(range(4, -1, -1)):
            params[f"upconv_{i}_0"] = conv3x3(base + 2 * j)
            params[f"upconv_{i}_1"] = conv3x3(base + 2 * j + 1)
        base = 15
    else:
        for j, i in enumerate(range(4, -1, -1)):
            params[f"upconv_{i}_0"] = conv3x3(2 * j)
            params[f"upconv_{i}_1"] = conv3x3(2 * j + 1)
        base = 10
    for j, s in enumerate(sorted(scales)):
        # dispconvs are bare Conv3x3 modules (path dispconv_s/conv)
        params[f"dispconv_{s}"] = {"conv": {
            "kernel": _conv_w(sd[f"decoder.{base + j}.conv.weight"]),
            "bias": sd[f"decoder.{base + j}.conv.bias"]}}
    return {"params": params, "batch_stats": {}, "variant": variant}


def import_pose_decoder(path: str) -> Dict[str, Any]:
    """Reference PoseDecoder ``.pth`` (pose_decoder.py:25-33) -> Flax tree."""
    sd = _load_pth(path)
    # ModuleList order: squeeze, pose0, pose1, pose2
    names = ["squeeze", "pose_0", "pose_1", "pose_2"]
    params = {}
    for i, name in enumerate(names):
        params[name] = {"kernel": _conv_w(sd[f"net.{i}.weight"]),
                        "bias": sd[f"net.{i}.bias"]}
    return {"params": params}


def import_pose_cnn(path: str) -> Dict[str, Any]:
    sd = _load_pth(path)
    params = {}
    for i in range(7):
        params[f"conv_{i}"] = {"kernel": _conv_w(sd[f"net.{i}.weight"]),
                               "bias": sd[f"net.{i}.bias"]}
    params["pose_conv"] = {"kernel": _conv_w(sd["pose_conv.weight"]),
                           "bias": sd["pose_conv.bias"]}
    return {"params": params}


def import_generator(path: str) -> Dict[str, Any]:
    """Frozen CycleGAN generator ``.pth`` (GeneratorResNet.py:21-68,
    sequential indices) -> Flax tree."""
    sd = _load_pth(path)

    def cw(i):
        return {"kernel": _conv_w(sd[f"model.{i}.weight"]),
                "bias": sd[f"model.{i}.bias"]}

    params = {"initial": cw(1), "down_0": cw(4), "down_1": cw(7)}
    # residual blocks at indices 10..10+n-1
    res_keys = [k for k in sd if ".block.1.weight" in k]
    n_res = len(res_keys)
    for r in range(n_res):
        base = 10 + r
        params[f"res_{r}"] = {
            "conv1": {"kernel": _conv_w(sd[f"model.{base}.block.1.weight"]),
                      "bias": sd[f"model.{base}.block.1.bias"]},
            "conv2": {"kernel": _conv_w(sd[f"model.{base}.block.5.weight"]),
                      "bias": sd[f"model.{base}.block.5.bias"]},
        }
    # after the res blocks (base = 10 + n_res) the Sequential continues:
    # Upsample, Conv, IN, ReLU, Upsample, Conv, IN, ReLU, ReflectionPad,
    # Conv, Tanh (GeneratorResNet.py:50-63)
    base = 10 + n_res
    params["up_0"] = cw(base + 1)
    params["up_1"] = cw(base + 5)
    params["output"] = cw(base + 9)
    return {"params": params}
