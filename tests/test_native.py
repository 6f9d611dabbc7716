"""Native C++ pack/unpack vs the numpy reference."""
import numpy as np
import pytest

from gptq_v2_tpu import native


def _numpy_pack(codes, g):
    r, c = codes.shape
    blocks = c // (8 * g)
    ct = codes.T.reshape(blocks, 8, g, r).astype(np.uint32)
    word = np.zeros((blocks, g, r), dtype=np.uint32)
    for i in range(8):
        word |= ct[:, i, :, :] << (4 * i)
    return word.reshape(c // 8, r).astype(np.int32)


@pytest.mark.skipif(native.get_lib() is None, reason="no C++ toolchain")
class TestNativePack:
    @pytest.mark.parametrize("r,c,g", [(64, 256, 16), (192, 1024, 128),
                                       (33, 512, 64)])
    def test_pack_matches_numpy(self, r, c, g):
        rng = np.random.default_rng(r + c + g)
        codes = rng.integers(0, 16, (r, c)).astype(np.uint8)
        np.testing.assert_array_equal(native.pack_int4(codes, g),
                                      _numpy_pack(codes, g))

    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        codes = rng.integers(0, 16, (96, 512)).astype(np.uint8)
        packed = native.pack_int4(codes, 64)
        np.testing.assert_array_equal(native.unpack_int4(packed, 64), codes)

    def test_public_api_uses_native(self):
        """ops.packing round trip goes through the same contract either way."""
        from gptq_v2_tpu.ops.packing import pack_int4, unpack_int4

        rng = np.random.default_rng(9)
        codes = rng.integers(0, 16, (40, 96)).astype(np.uint8)  # pads to 128
        packed = pack_int4(codes, 16)
        out = unpack_int4(packed, 16, c_orig=96)
        np.testing.assert_array_equal(out, codes)
