"""Native C++ chunk codec: correctness vs Python path, fallbacks, compression."""

import os

import numpy as np
import pytest

from sbgm_danra_tpu.data import native_codec, zarrlite

# The default policy disables the codec on <=2-core hosts (BASELINE-measured
# faster Python path); these tests exercise the codec itself, so force it and
# re-probe regardless of what earlier tests cached.
os.environ["SBGM_ZARR_CODEC_FORCE"] = "1"
native_codec._lib, native_codec._checked = None, False

pytestmark = pytest.mark.skipif(
    not native_codec.available(), reason="native codec not built (make -C native)"
)


@pytest.fixture()
def store(tmp_path):
    g = zarrlite.open_group(str(tmp_path / "s.zarr"), mode="w")
    data = np.random.default_rng(0).normal(size=(100, 120)).astype(np.float32)
    g.array("x", data, chunks=(40, 50))
    return zarrlite.open_group(str(tmp_path / "s.zarr"))["x"], data


class TestNativeCodec:
    def test_crop_matches_python(self, store):
        arr, data = store
        # force python path for the reference read
        native_codec._lib, native_codec._checked = native_codec._lib, True
        got = arr[13:87, 22:118]  # spans multiple chunks, native path
        np.testing.assert_array_equal(got, data[13:87, 22:118])

    def test_uncompressed_chunks(self, tmp_path):
        g = zarrlite.open_group(str(tmp_path / "u.zarr"), mode="w")
        data = np.arange(64, dtype=np.float32).reshape(8, 8)
        g.array("x", data, compressor=None)
        arr = zarrlite.open_group(str(tmp_path / "u.zarr"))["x"]
        np.testing.assert_array_equal(arr[2:6, 1:7], data[2:6, 1:7])

    def test_float64(self, tmp_path):
        g = zarrlite.open_group(str(tmp_path / "d.zarr"), mode="w")
        data = np.random.default_rng(1).normal(size=(16, 16))
        g.array("x", data)
        arr = zarrlite.open_group(str(tmp_path / "d.zarr"))["x"]
        np.testing.assert_array_equal(arr[3:9, 4:12], data[3:9, 4:12])

    def test_direct_decompress_crop(self, store):
        arr, data = store
        out = native_codec.decompress_crop(
            arr._chunk_path([0, 0]), True, (40, 50), np.float32, (5, 15, 10, 30)
        )
        np.testing.assert_array_equal(out, data[5:15, 10:30])

    def test_bad_path_returns_none(self):
        out = native_codec.decompress_crop(
            "/nonexistent/chunk", True, (4, 4), np.float32, (0, 2, 0, 2)
        )
        assert out is None

    def test_compress_roundtrip(self):
        import zlib

        payload = np.arange(1000, dtype=np.float32).tobytes()
        comp = native_codec.compress(payload, level=3)
        assert comp is not None and len(comp) < len(payload)
        assert zlib.decompress(comp) == payload


class TestAutoChunks:
    def test_small_arrays_single_chunk(self):
        from sbgm_danra_tpu.data.zarrlite import _auto_chunks

        assert _auto_chunks((64, 96), 4) == (64, 96)

    def test_large_arrays_tiled(self):
        from sbgm_danra_tpu.data.zarrlite import _auto_chunks

        ch = _auto_chunks((589, 789), 4)
        assert ch[0] < 589 and ch[1] < 789
        assert ch[0] * ch[1] * 4 <= 200 * 1024  # near the 128 KB target
