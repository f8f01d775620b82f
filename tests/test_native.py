"""Native library (cpp/flowdata.cc) vs numpy-path agreement tests."""

import numpy as np
import pytest

from flownet2_tpu.core import codec
from flownet2_tpu.core.flow_io import write_flo, write_ppm
from flownet2_tpu.data import native

lib = native.get_lib()
pytestmark = pytest.mark.skipif(lib is None, reason="libflowdata.so unavailable")


def test_version():
    assert lib.fd_version() == 2


def test_flow_codec_matches_numpy(rng):
    flow = rng.uniform(-400, 400, (13, 17, 2)).astype(np.float32)
    flow[0, 0, 0] = np.nan
    flow[5, 5, 1] = np.inf
    enc_native = native.encode_flow_i16(flow)
    enc_np = codec.encode_flow_int16(flow)
    np.testing.assert_array_equal(enc_native, enc_np)
    dec_native = native.decode_flow_i16(enc_np)
    dec_np = codec.decode_flow_int16(enc_np)
    np.testing.assert_array_equal(
        np.nan_to_num(dec_native, nan=12345.0), np.nan_to_num(dec_np, nan=12345.0)
    )


def test_pnm_decode(tmp_path, rng):
    img = rng.integers(0, 255, (9, 11, 3), dtype=np.uint8)
    p = tmp_path / "x.ppm"
    write_ppm(p, img)
    out = native.decode_pnm(p.read_bytes())
    np.testing.assert_array_equal(out, img)


def test_pnm_decode_comment(tmp_path):
    p = tmp_path / "c.ppm"
    p.write_bytes(b"P6\n# hello\n2 2\n255\n" + bytes(range(12)))
    out = native.decode_pnm(p.read_bytes())
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == 0 and out[1, 1, 2] == 11


def test_flo_decode(tmp_path, rng):
    flow = rng.standard_normal((7, 9, 2)).astype(np.float32)
    p = tmp_path / "x.flo"
    write_flo(p, flow)
    out = native.read_flo(p.read_bytes())
    np.testing.assert_array_equal(out, flow)


def test_record_decode_matches_python(tmp_path, rng):
    from flownet2_tpu.data import FlowRecordReader, FlowRecordWriter

    img0 = rng.integers(0, 255, (8, 10, 3)).astype(np.uint8)
    img1 = rng.integers(0, 255, (8, 10, 3)).astype(np.uint8)
    flow = rng.uniform(-10, 10, (8, 10, 2)).astype(np.float32)
    occ = rng.integers(0, 2, (8, 10)).astype(bool)
    path = str(tmp_path / "r.flowrec")
    with FlowRecordWriter(path) as w:
        w.write(img0, img1, flow, occ)
    r = FlowRecordReader(path)
    s = r[0]  # native path (lib present)
    np.testing.assert_array_equal(s["img0"], img0.astype(np.float32))
    np.testing.assert_allclose(s["flow"], flow, atol=1.0 / 64 + 1e-6)
    np.testing.assert_array_equal(s["occ"][..., 0], occ.astype(np.float32))


def test_disparity_record(tmp_path, rng):
    from flownet2_tpu.data import FlowRecordReader, FlowRecordWriter

    img0 = rng.integers(0, 255, (6, 8, 3)).astype(np.uint8)
    img1 = rng.integers(0, 255, (6, 8, 3)).astype(np.uint8)
    disp = rng.uniform(-60, 0, (6, 8)).astype(np.float32)  # disparity: negative convention
    path = str(tmp_path / "d.flowrec")
    with FlowRecordWriter(path) as w:
        w.write(img0, img1, disp)
    s = FlowRecordReader(path)[0]
    assert s["flow"].shape == (6, 8, 1)
    np.testing.assert_allclose(s["flow"][..., 0], disp, atol=1.0 / 64 + 1e-6)
