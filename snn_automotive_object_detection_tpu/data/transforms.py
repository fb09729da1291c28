"""Host-side image/box transforms (numpy + cv2).

Covers the reference's transform presets (/root/reference/presets.py,
transforms.py): horizontal flip for training (the default and only
augmentation used by the released models), plus the evaluation-time
corruption transforms for the robustness studies:

  * gaussian / salt-and-pepper noise with skimage.random_noise semantics
    (transforms.py:87-107): additive N(0, var) on [0,1] floats, clipped;
    s&p flips `amount` of the pixels to 0/1 in equal proportion
  * synthetic rain (transforms.py:110-191): random slanted streaks drawn with
    cv2.line, box blur, HLS lightness scaling — light=300 drops/4x4
    blur/0.97, heavy=1000 drops/6x6 blur/0.95, parametric count otherwise

All transforms take and return (image uint8|float RGB HWC, target dict) —
the loader converts to float [0,1] at the end.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, image, target):
        for t in self.transforms:
            image, target = t(image, target)
        return image, target


class RandomHorizontalFlip:
    """Flip image + boxes with probability p (transforms.py:30-52)."""

    def __init__(self, p: float = 0.5, rng: Optional[np.random.Generator] = None):
        self.p = p
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, target):
        if self.rng.random() < self.p:
            image = np.ascontiguousarray(image[:, ::-1])
            if target is not None and len(target.get("boxes", ())):
                w = image.shape[1]
                b = target["boxes"].copy()
                b[:, [0, 2]] = w - b[:, [2, 0]]
                target = {**target, "boxes": b}
        return image, target


def _to_float01(image: np.ndarray) -> np.ndarray:
    if image.dtype == np.uint8:
        return image.astype(np.float32) / 255.0
    return image.astype(np.float32)


class RandomNoise:
    """skimage.random_noise equivalent ('gaussian' / 'syp')."""

    def __init__(self, noise_type: str, noise_intensity: float,
                 rng: Optional[np.random.Generator] = None):
        if noise_type not in ("gaussian", "syp"):
            raise ValueError(f"unknown noise type {noise_type!r}")
        self.mode = noise_type
        self.intensity = float(noise_intensity)
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, target):
        img = _to_float01(image)
        if self.mode == "gaussian":
            img = img + self.rng.normal(0.0, np.sqrt(self.intensity), img.shape)
        else:  # salt & pepper
            flip = self.rng.random(img.shape[:2]) < self.intensity
            salt = self.rng.random(img.shape[:2]) < 0.5
            img[flip & salt] = 1.0
            img[flip & ~salt] = 0.0
        return np.clip(img, 0.0, 1.0).astype(np.float32), target


class Rain:
    """Synthetic rain streaks (transforms.py:110-191 behaviour)."""

    PRESETS = {
        "light": dict(drops=300, color=(125, 125, 125), blur=(4, 4), brightness=0.97),
        "heavy": dict(drops=1000, color=(150, 150, 150), blur=(6, 6), brightness=0.95),
        "rain": dict(drops=None, color=(150, 150, 150), blur=(6, 6), brightness=0.95),
    }

    def __init__(self, rain_type: str, number_of_drops: Optional[int] = None,
                 rng: Optional[np.random.Generator] = None):
        if rain_type not in self.PRESETS:
            raise ValueError(f"unknown rain type {rain_type!r}")
        p = self.PRESETS[rain_type]
        self.drops = p["drops"] if p["drops"] is not None else int(number_of_drops)
        self.color = p["color"]
        self.blur = p["blur"]
        self.brightness = p["brightness"]
        self.slant_extreme = 10
        self.drop_length = 15
        self.drop_width = 2
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, target):
        import cv2

        img = _to_float01(image).copy()
        h, w = img.shape[:2]
        slant = int(self.rng.integers(-self.slant_extreme, self.slant_extreme))
        color = tuple(c / 255.0 for c in self.color)
        for _ in range(self.drops):
            if slant < 0:
                x = int(self.rng.integers(slant, w))
            else:
                x = int(self.rng.integers(0, max(w - slant, 1)))
            y = int(self.rng.integers(0, max(h - self.drop_length, 1)))
            cv2.line(img, (x, y), (x + slant, y + self.drop_length),
                     color, self.drop_width)
        img = cv2.blur(img, self.blur)
        hls = cv2.cvtColor(img, cv2.COLOR_RGB2HLS)
        hls[:, :, 1] = hls[:, :, 1] * self.brightness
        img = cv2.cvtColor(hls, cv2.COLOR_HLS2RGB)
        return np.clip(img, 0.0, 1.0).astype(np.float32), target


def train_transform(data_augmentation: str = "hflip",
                    rng: Optional[np.random.Generator] = None):
    """Training preset (presets.py:12-67 — released models use 'hflip')."""
    if data_augmentation == "hflip":
        return Compose([RandomHorizontalFlip(0.5, rng)])
    if data_augmentation in ("none", ""):
        return Compose([])
    raise NotImplementedError(
        f"augmentation policy {data_augmentation!r} not implemented "
        "(reference default is 'hflip')"
    )


def eval_transform(add_noise: str = "", noise_intensity: float = 0.05,
                   rng: Optional[np.random.Generator] = None):
    """Evaluation preset incl. corruption variants (presets.py:70-118)."""
    ts = []
    if add_noise == "gaussian":
        ts.append(RandomNoise("gaussian", noise_intensity, rng))
    elif add_noise == "syp":
        ts.append(RandomNoise("syp", noise_intensity, rng))
    elif add_noise == "rain":
        ts.append(Rain("rain", int(noise_intensity), rng))
    elif add_noise == "light-rain":
        ts.append(Rain("light", rng=rng))
    elif add_noise == "heavy-rain":
        ts.append(Rain("heavy", rng=rng))
    elif add_noise:
        raise ValueError(f"unknown noise option {add_noise!r}")
    return Compose(ts)
