"""Data layer: torch-free .pth reading, cache round trips, windowing."""
from pathlib import Path

import numpy as np
import pytest

from gptq_v2_tpu import data

REF_CACHE = Path("/root/reference/cache/datasets")


class TestPthReader:
    def test_roundtrip_tensor(self, tmp_path):
        torch = pytest.importorskip("torch")
        t = torch.arange(24, dtype=torch.int64).reshape(4, 6)
        torch.save(t, tmp_path / "t.pth")
        out = data.load_pth(tmp_path / "t.pth")
        np.testing.assert_array_equal(out, t.numpy())

    def test_roundtrip_fp16_strided(self, tmp_path):
        torch = pytest.importorskip("torch")
        t = torch.randn(8, 10, dtype=torch.float16).t().contiguous().t()
        torch.save(t, tmp_path / "t.pth")
        np.testing.assert_array_equal(data.load_pth(tmp_path / "t.pth"), t.numpy())

    @pytest.mark.skipif(not REF_CACHE.exists(), reason="reference cache absent")
    def test_reads_reference_shipped_caches(self):
        torch = pytest.importorskip("torch")
        for f in REF_CACHE.glob("*.pth"):
            ours = data.load_pth(f)
            ref = torch.load(f, weights_only=True).numpy()
            np.testing.assert_array_equal(ours, ref)
            assert ours.dtype == np.int64
            assert ours.shape[1] == 2048


class TestCaching:
    @pytest.mark.skipif(not REF_CACHE.exists(), reason="reference cache absent")
    def test_get_dataloader_hits_pth_cache(self):
        tokens = data.get_dataloader("c4", "train", 2048, 128, seed=0,
                                     cache_dir=str(REF_CACHE))
        assert tokens.shape == (128, 2048)
        assert tokens.dtype == np.int64

    def test_npz_cache_roundtrip(self, tmp_path, monkeypatch):
        fake = np.arange(64, dtype=np.int64).reshape(4, 16)
        monkeypatch.setitem(data._BUILDERS, "fake", lambda *a: fake)
        t1 = data.get_dataloader("fake", "train", 16, 4, cache_dir=str(tmp_path))
        assert (tmp_path / "fake_train_0016_0004_0000.npz").exists()
        # cache hit must not call the builder again
        monkeypatch.setitem(data._BUILDERS, "fake", lambda *a: 1 / 0)
        t2 = data.get_dataloader("fake", "train", 16, 4, cache_dir=str(tmp_path))
        np.testing.assert_array_equal(t1, t2)


class TestWindows:
    def test_eval_full_coverage_strides(self):
        ids = np.arange(100, dtype=np.int64)[None]
        w = data._windows(ids, 16, n_samples=999, split="test", seed=0)
        assert w.shape == (6, 16)  # floor((100-16)/16)+1
        np.testing.assert_array_equal(w[0], np.arange(16))
        np.testing.assert_array_equal(w[5], np.arange(80, 96))

    def test_train_windows_reference_rng(self):
        torch = pytest.importorskip("torch")
        ids = np.arange(1000, dtype=np.int64)[None]
        w = data._windows(ids, 8, n_samples=5, split="train", seed=0)
        torch.random.manual_seed(0)
        expected_idx = torch.randint(1000 - 8 + 1, [5]).tolist()
        np.testing.assert_array_equal(w[:, 0], np.asarray(expected_idx))
