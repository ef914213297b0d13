"""Host-side photometric augmentation (numpy/PIL).

Re-implements the reference's per-item augmentation pipeline
(`/root/reference/datasets/mono_dataset2.py:91-96,155-156,179-187`):
ColorJitter(brightness/contrast/saturation 0.8-1.2, hue ±0.1) and
RandomAutocontrast — each drawn ONCE per item and applied identically to all
frames. The reference's Compose also contains a RandomHorizontalFlip that is
re-drawn per frame and applies only to the aug stream, mirroring the network
input against the loss geometry for a quarter of the items — a defect, not
intent; photometric aug here is photometric only, and the geometric do_flip
of `mono_dataset2.py:156` (applied to BOTH color and color_aug in
datasets.py) is the one flip.

Jitter factors are applied in a fixed order (brightness, contrast,
saturation, hue) rather than torchvision's random order — same distribution
family, deterministic given the item RNG.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from PIL import Image, ImageEnhance, ImageOps


@dataclasses.dataclass(frozen=True)
class AugmentParams:
    enabled: bool
    brightness: float = 1.0
    contrast: float = 1.0
    saturation: float = 1.0
    hue: float = 0.0
    autocontrast: bool = False

    @classmethod
    def draw(cls, rng: np.random.Generator, is_train: bool) -> "AugmentParams":
        if not is_train or rng.random() <= 0.5:
            # do_color_aug = random() > 0.5 (mono_dataset2.py:155)
            return cls(enabled=False)
        return cls(
            enabled=True,
            brightness=float(rng.uniform(0.8, 1.2)),
            contrast=float(rng.uniform(0.8, 1.2)),
            saturation=float(rng.uniform(0.8, 1.2)),
            hue=float(rng.uniform(-0.1, 0.1)),
            autocontrast=bool(rng.random() < 0.5),
        )

    def to_vector(self) -> np.ndarray:
        """(6,) float32 for the device-side pipeline
        (ops.augment_device.batch_augment; field order PARAM_FIELDS)."""
        return np.asarray(
            [1.0 if self.enabled else 0.0, self.brightness, self.contrast,
             self.saturation, self.hue, 1.0 if self.autocontrast else 0.0],
            np.float32)


def apply_augment(img: Image.Image, p: AugmentParams) -> Image.Image:
    if not p.enabled:
        return img
    img = ImageEnhance.Brightness(img).enhance(p.brightness)
    img = ImageEnhance.Contrast(img).enhance(p.contrast)
    img = ImageEnhance.Color(img).enhance(p.saturation)
    if p.hue != 0.0:
        hsv = np.array(img.convert("HSV"), dtype=np.int16)
        hsv[..., 0] = (hsv[..., 0] + int(p.hue * 255)) % 256
        img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    if p.autocontrast:
        img = ImageOps.autocontrast(img)
    return img
