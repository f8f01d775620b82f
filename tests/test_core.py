"""Core I/O and codec round-trip tests."""

import numpy as np

from flownet2_tpu.core import (
    adapt_shape,
    decode_flow_int16,
    encode_flow_int16,
    read_flo,
    read_pfm,
    read_ppm,
    write_flo,
    write_pfm,
    write_ppm,
)
from flownet2_tpu.core.codec import decode_occlusion_bits, encode_occlusion_bits


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((17, 23, 2)).astype(np.float32)
    p = tmp_path / "a.flo"
    write_flo(p, flow)
    got = read_flo(p)
    np.testing.assert_array_equal(got, flow)
    # byte-level: header is PIEH + little-endian w,h (output.cpp:52-55)
    raw = p.read_bytes()
    assert raw[:4] == b"PIEH"
    assert int.from_bytes(raw[4:8], "little") == 23
    assert int.from_bytes(raw[8:12], "little") == 17


def test_ppm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 255, (11, 13, 3), dtype=np.uint8)
    p = tmp_path / "a.ppm"
    write_ppm(p, img)
    np.testing.assert_array_equal(read_ppm(p), img)


def test_ppm_comment_header(tmp_path):
    p = tmp_path / "c.ppm"
    p.write_bytes(b"P6\n# a comment\n2 2\n255\n" + bytes(12))
    assert read_ppm(p).shape == (2, 2, 3)


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.standard_normal((7, 9, 3)).astype(np.float32)
    p = tmp_path / "a.pfm"
    write_pfm(p, img)
    got, scale = read_pfm(p)
    np.testing.assert_allclose(got, img, rtol=1e-6)
    assert scale == 1.0


def test_flow_codec_roundtrip(rng):
    flow = rng.uniform(-500, 500, (5, 6, 2)).astype(np.float32)
    flow[0, 0, 0] = np.nan
    enc = encode_flow_int16(flow)
    dec = decode_flow_int16(enc)
    assert np.isnan(dec[0, 0, 0])
    m = ~np.isnan(flow)
    # quantization step is 1/32 (convert_imageset_and_flow.cpp:169-181)
    np.testing.assert_allclose(dec[m], flow[m], atol=1.0 / 64 + 1e-6)


def test_occlusion_bits_roundtrip(rng):
    occ = rng.integers(0, 2, (9, 13)).astype(bool)
    assert np.array_equal(decode_occlusion_bits(encode_occlusion_bits(occ), occ.shape), occ)


def test_adapt_shape():
    g = adapt_shape(320, 448)
    assert (g.adapted_height, g.adapted_width) == (320, 448)
    assert not g.needs_resize
    g = adapt_shape(436, 1024)  # Sintel
    assert (g.adapted_height, g.adapted_width) == (448, 1024)
    assert g.scale_height == 436 / 448.0
    assert g.scale_width == 1.0


def test_tune_host_allocator_idempotent():
    """glibc allocator tuning applies on this platform and is idempotent
    (see core/hostmem.py: reuse of large buffers instead of per-allocation
    mmap/munmap page-zeroing)."""
    from flownet2_tpu.core.hostmem import tune_host_allocator

    assert tune_host_allocator() is True
    assert tune_host_allocator() is True
