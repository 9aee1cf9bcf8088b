"""Image I/O tests: PNG/HDR round trips and reference naming conventions."""
import numpy as np

from pathtracer_tpu.io.image import (load_png, reference_style_name, save_hdr,
                                     save_png, to_uint8)


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((16, 24, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_png(img, p, mirror_x=False)
    back = load_png(p)
    assert back.shape == img.shape
    np.testing.assert_allclose(back, np.clip(img, 0, 1), atol=1 / 255 + 1e-6)


def test_png_mirror_x(tmp_path):
    """saveImage mirrors x (reference main.cpp:407)."""
    img = np.zeros((2, 4, 3), np.float32)
    img[:, 0, 0] = 1.0  # red in column 0
    p = str(tmp_path / "m.png")
    save_png(img, p, mirror_x=True)
    back = load_png(p)
    assert back[0, -1, 0] > 0.9 and back[0, 0, 0] < 0.1


def test_hdr_writer_valid_radiance(tmp_path):
    """Minimal Radiance RGBE output: header + decodable pixel values."""
    img = np.array([[[0.5, 1.0, 2.0], [0.0, 0.0, 0.0]]], np.float32)
    p = str(tmp_path / "x.hdr")
    save_hdr(img, p, mirror_x=False)
    raw = open(p, "rb").read()
    assert raw.startswith(b"#?RADIANCE")
    header_end = raw.index(b"\n-Y")
    dims = raw[header_end + 1:].split(b"\n", 1)[0]
    assert dims == b"-Y 1 +X 2"
    rgbe = np.frombuffer(raw.split(b"-Y 1 +X 2\n", 1)[1], np.uint8)
    rgbe = rgbe.reshape(1, 2, 4)
    # decode pixel 0: value = mantissa/256 * 2^(e-128)
    e = rgbe[0, 0, 3].astype(np.int32) - 128
    decoded = rgbe[0, 0, :3].astype(np.float64) / 256.0 * 2.0 ** e
    np.testing.assert_allclose(decoded, [0.5, 1.0, 2.0], rtol=0.02)
    # zero pixel encodes to all-zero
    assert (rgbe[0, 1] == 0).all()


def test_to_uint8_clamps():
    img = np.array([[[-1.0, 0.5, 7.0]]], np.float32)
    out = to_uint8(img)
    assert out.tolist() == [[[0, 127, 255]]]


def test_reference_style_name():
    name = reference_style_name("cornell", 500)
    assert name.startswith("cornell.") and name.endswith(".500samp.png")
