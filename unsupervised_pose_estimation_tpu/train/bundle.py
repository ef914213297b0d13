"""Model bundle: constructs and initializes every network a run needs.

The counterpart of the reference Trainer's model-dict assembly
(`/root/reference/trainer.py:135-181`), as pure construction + a functional
``init`` — no device placement, no mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Options
from ..models import (DepthDecoder, GeneratorResNet, PatchGANDiscriminator,
                      PoseCNN, PoseDecoder, ResNetEncoder)


def _dtype(cfg: Options):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


@dataclasses.dataclass
class ModelBundle:
    """Holds module definitions; params/stats live in TrainState."""

    cfg: Options
    encoder: ResNetEncoder
    depth: DepthDecoder
    pose_encoder: Optional[ResNetEncoder] = None
    pose: Any = None
    predictive_mask: Optional[DepthDecoder] = None
    generator: Optional[GeneratorResNet] = None
    discriminator: Optional[PatchGANDiscriminator] = None

    @classmethod
    def create(cls, cfg: Options) -> "ModelBundle":
        dt = _dtype(cfg)
        enc = ResNetEncoder(num_layers=cfg.num_layers, compute_dtype=dt)
        depth = DepthDecoder(scales=tuple(cfg.scales), compute_dtype=dt,
                             variant=cfg.depth_decoder_variant)

        pose_encoder = None
        pose = None
        if cfg.use_pose_net:
            if cfg.pose_model_type == "separate_resnet":
                pose_encoder = ResNetEncoder(
                    num_layers=cfg.num_layers,
                    num_input_images=cfg.num_pose_frames, compute_dtype=dt)
                pose = PoseDecoder(num_input_features=1,
                                   num_frames_to_predict_for=2,
                                   compute_dtype=dt)
            elif cfg.pose_model_type == "shared":
                # reference: num_frames_to_predict_for defaults to
                # num_input_features - 1 (pose_decoder.py:21-23)
                pose = PoseDecoder(
                    num_input_features=cfg.num_pose_frames,
                    num_frames_to_predict_for=cfg.num_pose_frames - 1,
                    compute_dtype=dt)
            elif cfg.pose_model_type == "posecnn":
                n = (cfg.num_input_frames
                     if cfg.pose_model_input == "all" else 2)
                pose = PoseCNN(num_input_frames=n, compute_dtype=dt)
            else:
                raise ValueError(cfg.pose_model_type)

        pmask = None
        if cfg.predictive_mask:
            pmask = DepthDecoder(
                scales=tuple(cfg.scales),
                num_output_channels=len(cfg.frame_ids) - 1, compute_dtype=dt)

        gen = None
        if cfg.pre_trained_generator:
            gen = GeneratorResNet(channels=1, num_residual_blocks=9,
                                  compute_dtype=dt)
        disc = None
        if cfg.adversarial_prior:
            disc = PatchGANDiscriminator(compute_dtype=dt)

        return cls(cfg=cfg, encoder=enc, depth=depth,
                   pose_encoder=pose_encoder, pose=pose,
                   predictive_mask=pmask, generator=gen, discriminator=disc)

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, Dict]:
        """Initialize all variables. Returns {'params': {...}, 'batch_stats':
        {...}, 'frozen': {...}} keyed by model name (reference model-dict
        names, trainer.py:135-181)."""
        cfg = self.cfg
        h, w = cfg.height, cfg.width
        keys = jax.random.split(rng, 8)
        x = jnp.zeros((1, h, w, 3), jnp.float32)

        params: Dict[str, Any] = {}
        stats: Dict[str, Any] = {}
        frozen: Dict[str, Any] = {}

        def split_vars(variables):
            return (variables["params"],
                    variables.get("batch_stats", {}))

        v = self.encoder.init({"params": keys[0]}, x, False)
        params["encoder"], stats["encoder"] = split_vars(v)
        feats = self.encoder.apply(v, x, False)

        v = self.depth.init({"params": keys[1]}, feats, False)
        params["depth"], stats["depth"] = split_vars(v)

        if self.pose_encoder is not None:
            xp = jnp.zeros((1, h, w, 3 * cfg.num_pose_frames), jnp.float32)
            v = self.pose_encoder.init({"params": keys[2]}, xp, False)
            params["pose_encoder"], stats["pose_encoder"] = split_vars(v)
            pose_feats = self.pose_encoder.apply(v, xp, False)
            v = self.pose.init({"params": keys[3]}, [pose_feats])
            params["pose"], _ = split_vars(v)
        elif isinstance(self.pose, PoseDecoder):  # shared encoder
            v = self.pose.init({"params": keys[3]},
                               [feats] * cfg.num_pose_frames)
            params["pose"], _ = split_vars(v)
        elif isinstance(self.pose, PoseCNN):
            n = self.pose.num_input_frames
            xp = jnp.zeros((1, h, w, 3 * n), jnp.float32)
            v = self.pose.init({"params": keys[3]}, xp)
            params["pose"], _ = split_vars(v)

        if self.predictive_mask is not None:
            v = self.predictive_mask.init({"params": keys[4]}, feats, False)
            params["predictive_mask"], stats["predictive_mask"] = split_vars(v)

        if self.generator is not None:
            xg = jnp.zeros((1, h, w, 1), jnp.float32)
            v = self.generator.init({"params": keys[5]}, xg)
            frozen["pre_trained_generator"] = v["params"]

        disc_params = None
        if self.discriminator is not None:
            xd = jnp.zeros((1, h, w, 1), jnp.float32)
            v = self.discriminator.init({"params": keys[6]}, xd)
            disc_params = v["params"]  # trained by its own Adam, not the
            # main optimizer (intent of trainer.py:93-106, defect-fixed)

        return {"params": params, "batch_stats": stats, "frozen": frozen,
                "disc_params": disc_params}
