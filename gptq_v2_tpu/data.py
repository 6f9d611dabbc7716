"""Calibration / evaluation dataset pipelines + caches.

Mirrors the reference data layer (reference: ``data_utils.py``) semantics:

* ``get_dataloader`` dispatches on dataset name, returns ``(N, seqlen)``
  int64 token windows, and caches them keyed
  ``{name}_{split}_{seqlen:04}_{n_samples:04}_{seed:04}`` (reference
  ``data_utils.py:23``),
* wikitext2/ptb: join text with ``"\\n\\n"``; train = seeded random windows,
  test = non-overlapping ``seqlen`` strides over the full corpus
  (``data_utils.py:47-76``),
* c4: per-doc random windows (train / old-style eval); "new"-style eval =
  first 1100 docs joined, truncated (``data_utils.py:79-107``),
* mmlu: question + correct answer joined (``data_utils.py:110-121``).

Window sampling uses torch's RNG when torch is importable so cached sets are
**token-identical** to the reference's shipped caches; otherwise a numpy
fallback produces statistically equivalent (but not identical) windows.

Cache formats: reads both our native ``.npz`` and the reference's ``.pth``
(torch zip serialization) — the latter through a torch-free unpickler, so
the shipped ``cache/datasets/*.pth`` files work without torch installed.
"""
from __future__ import annotations

import io
import logging
import os
import pickle
import zipfile
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# torch-free .pth (zip) tensor reader
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    "DoubleStorage": np.float64,
    "FloatStorage": np.float32,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _Storage:
    def __init__(self, dtype, data: bytes):
        self.array = np.frombuffer(data, dtype=dtype)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *unused):
    a = storage.array
    if size == ():
        return a[storage_offset].copy()
    return np.lib.stride_tricks.as_strided(
        a[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * a.itemsize for s in stride),
    ).copy()


def load_pth(path) -> np.ndarray | dict | list:
    """Read a torch.save zip archive with plain numpy (tensors only)."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        class U(pickle.Unpickler):
            def find_class(self, module, name):
                if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
                    return _rebuild_tensor_v2
                if module == "torch" and name in _STORAGE_DTYPES:
                    return ("storage_type", _STORAGE_DTYPES[name])
                if module == "collections" and name == "OrderedDict":
                    return dict
                if (module, name) == ("torch.serialization", "_get_layout"):
                    return lambda *_: None
                raise pickle.UnpicklingError(f"blocked global {module}.{name}")

            def persistent_load(self, pid):
                kind, storage_type, key, _location, _numel = pid
                assert kind == "storage"
                dtype = storage_type[1]
                with zf.open(f"{prefix}data/{key}") as f:
                    return _Storage(dtype, f.read())

        with zf.open(pkl_name) as f:
            return U(io.BytesIO(f.read())).load()


# ---------------------------------------------------------------------------
# Window sampling (reference-RNG-compatible)
# ---------------------------------------------------------------------------


def _seeded_randint_windows(upper: int, n: int, seed: int) -> list[int]:
    """n ints in [0, upper): identical stream to the reference
    (``torch.random.manual_seed(seed)``; ``torch.randint``,
    data_utils.py:10-12,54) when torch is available."""
    try:
        import torch

        torch.random.manual_seed(seed)
        np.random.seed(seed)
        return torch.randint(upper, [n]).tolist()
    except ImportError:
        logger.warning("torch unavailable: window sampling uses numpy RNG "
                       "(windows differ from reference caches)")
        return np.random.default_rng(seed).integers(0, upper, n).tolist()


def _windows(input_ids: np.ndarray, seqlen: int, n_samples: int,
             split: str, seed: int) -> np.ndarray:
    """input_ids: (1, T) → (N, seqlen). Train = random windows; eval = full
    coverage with non-overlapping strides (reference data_utils.py:52-59)."""
    total = input_ids.shape[-1]
    if split == "train":
        idx = _seeded_randint_windows(total - seqlen + 1, n_samples, seed)
    else:
        idx = range(0, total - seqlen + 1, seqlen)
    return np.concatenate([input_ids[:, i:i + seqlen] for i in idx], axis=0)


def _tokenizer(model_path: str):
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(model_path, use_fast=False)


def _tokenize(tok, text: str) -> np.ndarray:
    return np.asarray(tok(text, return_tensors="np").input_ids, dtype=np.int64)


# ---------------------------------------------------------------------------
# Dataset builders (need HF datasets + a tokenizer; cached results don't)
# ---------------------------------------------------------------------------


def get_wikitext2(split, seqlen, n_samples, model_path, seed) -> np.ndarray:
    from datasets import load_dataset

    ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    ids = _tokenize(_tokenizer(model_path), "\n\n".join(ds["text"]))
    return _windows(ids, seqlen, n_samples, split, seed)


def get_ptb(split, seqlen, n_samples, model_path, seed) -> np.ndarray:
    from datasets import load_dataset

    ds = load_dataset("ptb_text_only", "penn_treebank", split=split,
                      trust_remote_code=True)
    ids = _tokenize(_tokenizer(model_path), "\n\n".join(ds["sentence"]))
    return _windows(ids, seqlen, n_samples, split, seed)


def get_c4(split, seqlen, n_samples, model_path, seed, new: bool) -> np.ndarray:
    from datasets import load_dataset

    if split == "train":
        ds = load_dataset("allenai/c4",
                          data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
                          split="train")
    else:
        ds = load_dataset("allenai/c4",
                          data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
                          split="validation")
    tok = _tokenizer(model_path)

    if split == "train" or not new:
        # Per-doc random windows with the reference's exact RNG protocol
        # (random.randint under set_seed, data_utils.py:90-101).
        import random as pyrandom

        try:
            import torch

            np.random.seed(seed)
            torch.random.manual_seed(seed)
        except ImportError:
            np.random.seed(seed)
        pyrandom_state = pyrandom  # reference uses the global `random` module
        out = []
        for _ in range(n_samples):
            while True:
                di = pyrandom_state.randint(0, len(ds) - 1)
                ids = _tokenize(tok, ds[di]["text"])
                if ids.shape[-1] >= seqlen:
                    break
            i = pyrandom_state.randint(0, ids.shape[-1] - seqlen)
            out.append(ids[:, i:i + seqlen])
        return np.concatenate(out, axis=0)

    ids = _tokenize(tok, " ".join(ds[:1100]["text"]))[:, :seqlen * n_samples]
    return np.concatenate(
        [ids[:, i:i + seqlen] for i in range(0, ids.shape[-1] - seqlen + 1, seqlen)],
        axis=0)


def get_mmlu(split, seqlen, n_samples, model_path, seed) -> np.ndarray:
    from datasets import load_dataset

    ds = load_dataset("cais/mmlu", "all", split=split, trust_remote_code=True)
    texts = [s["question"] + " " + s["choices"][s["answer"]] for s in ds]
    ids = _tokenize(_tokenizer(model_path), "\n\n".join(texts))
    idx = _seeded_randint_windows(ids.shape[-1] - seqlen + 1, n_samples, seed)
    return np.concatenate([ids[:, i:i + seqlen] for i in idx], axis=0)


_BUILDERS = {
    "wikitext2": lambda *a: get_wikitext2(*a),
    "ptb": lambda *a: get_ptb(*a),
    "c4": lambda *a: get_c4(*a, new=False),
    "c4-new": lambda *a: get_c4(*a, new=True),
    "mmlu": lambda *a: get_mmlu(*a),
}


def cache_key(name: str, split: str, seqlen: int, n_samples: int, seed: int) -> str:
    return f"{name}_{split}_{seqlen:04}_{n_samples:04}_{seed:04}"


def get_dataloader(
    name: str,
    split: str = "train",
    seqlen: int = 2048,
    n_samples: int = 256,
    model_path: str = "",
    seed: int = 0,
    cache_dir: str = "",
) -> np.ndarray:
    """Return ``(N, seqlen)`` int64 token windows, with caching.

    Cache lookup order: our ``.npz``, then the reference's ``.pth`` format
    (so the reference's shipped ``cache/datasets`` works as-is).
    """
    key = cache_key(name, split, seqlen, n_samples, seed)
    if cache_dir:
        npz = Path(cache_dir) / f"{key}.npz"
        if npz.exists():
            return np.load(npz)["tokens"]
        pth = Path(cache_dir) / f"{key}.pth"
        if pth.exists():
            arr = load_pth(pth)
            return np.asarray(arr, dtype=np.int64)
    if name not in _BUILDERS:
        raise NotImplementedError(name)
    tokens = _BUILDERS[name](split, seqlen, n_samples, model_path, seed)
    tokens = np.asarray(tokens, dtype=np.int64)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(Path(cache_dir) / f"{key}.npz", tokens=tokens)
    return tokens
