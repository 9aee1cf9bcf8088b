"""Image output: PNG and Radiance HDR writers.

Replicates the reference's save path (Image::savePNG/saveHDR, src/image.cpp:
23-50, driven by saveImage at src/main.cpp:395-419): PNG is clamp(pix,0,1)*255
3-channel; saveImage mirrors x (width-1-x) and names files
"<name>.<timestamp>.<N>samp.png".
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """HDR float [H,W,3] -> clamped 8-bit (image.cpp:28-38)."""
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255.0).astype(np.uint8)


def save_png(img, path: str, mirror_x: bool = True) -> str:
    """Save averaged image as PNG. mirror_x replicates main.cpp:407."""
    from PIL import Image as PILImage

    arr = to_uint8(img)
    if mirror_x:
        arr = arr[:, ::-1, :]
    PILImage.fromarray(arr, mode="RGB").save(path)
    return path


def save_hdr(img, path: str, mirror_x: bool = True) -> str:
    """Minimal Radiance RGBE (.hdr) writer, flat (non-RLE) scanlines
    (image.cpp:45-50 equivalent)."""
    arr = np.asarray(img, dtype=np.float32)
    if mirror_x:
        arr = arr[:, ::-1, :]
    h, w, _ = arr.shape
    maxc = arr.max(axis=-1)
    valid = maxc >= 1e-32
    m, e = np.frexp(np.where(valid, maxc, 1.0))
    scale = np.where(valid, m * 256.0 / np.where(valid, maxc, 1.0), 0.0)
    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    rgbe[..., 0] = np.clip(arr[..., 0] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 1] = np.clip(arr[..., 1] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 2] = np.clip(arr[..., 2] * scale, 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(valid, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    return path


def reference_style_name(image_name: str, samples: int,
                         ext: str = "png") -> str:
    """"<FILE>.<UTC timestamp>.<N>samp.<ext>" (main.cpp:398-404)."""
    ts = time.strftime("%Y-%m-%d_%H-%M-%Sz", time.gmtime())
    return f"{image_name}.{ts}.{samples}samp.{ext}"


def load_png(path: str) -> np.ndarray:
    from PIL import Image as PILImage

    return np.asarray(PILImage.open(path).convert("RGB"), dtype=np.float32) / 255.0
