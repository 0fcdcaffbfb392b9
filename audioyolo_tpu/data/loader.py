"""Host-side batch loader with background prefetch.

Replaces torch ``DataLoader(num_workers=...)`` (``train.py:61-67``) with a
thread-prefetched batcher producing static-shape numpy batch dicts. Audio
decode is cheap (raw PCM reads); the double-buffered prefetch thread keeps the
host ahead of the device so the jitted step never waits on IO.

``last_batch`` policies:
- ``"partial"`` (default, matches the reference) — the final short batch is
  emitted as-is (costs one extra XLA compilation for the remainder shape);
- ``"pad"`` — repeat-pad to full batch size with ``valid=False`` targets and
  a ``clip_valid`` mask (use for sharded multi-chip runs where the leading
  axis must divide the mesh). The loss masks padded clips out of every term
  and metric (train/loss.py), so they contribute nothing — the one residual
  train-mode effect is that BatchNorm batch statistics still see the
  duplicated clips (bounded: duplicates of a real clip shift stats by at most
  one batch fraction; eval mode is exact);
- ``"drop"`` — drop the remainder.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator

import numpy as np

from .dataset import AudioDataset


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 42,
        last_batch: str = "partial",
        prefetch: int = 2,
        transfer_dtype: str = "float32",
        frame_fn=None,
        framer=None,
        shard: "tuple[int, int] | None" = None,
    ):
        """``transfer_dtype="int16"`` ships PCM16 to the device and lets the
        frontend dequantize in-graph — 4x less host->device traffic, bit-exact
        for 16-bit sources (the feature extractor scales by 1/32768 exactly as
        the WAV readers do).

        ``frame_fn`` (``SpectralFrontend.frame_host``) converts each batch's
        waveforms to phase-grouped frames on the prefetch thread so the device
        never pays the frontend's relayout reshapes (ops/fused_frontend.py);
        composes with ``transfer_dtype="int16"``.

        ``framer`` (a ``FusedFrameDFT``, e.g. ``SpectralFrontend.fused``)
        additionally unlocks the native C++ framed decode: with
        ``transfer_dtype="int16"`` the batch is read from disk straight into
        the phase-grouped int16 frame layout in one multithreaded C call (no
        float round trip, no numpy restack, no quantize pass). Implies
        ``frame_fn=framer.frame_host`` for the fallback paths.

        ``shard=(index, count)`` makes this loader own a disjoint 1/count
        slice of every epoch — the multi-host data-parallel contract
        (``jax.process_index()/process_count()``): all hosts shuffle the same
        global order (same seed+epoch), each takes a strided slice, so the
        union covers the dataset exactly once per epoch. Lengths stay equal
        across hosts (required for lockstep collectives): the last slice is
        padded by wrap-around when ``len(dataset)`` is not divisible."""
        if last_batch not in ("partial", "pad", "drop"):
            raise ValueError(f"unknown last_batch policy '{last_batch}'")
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(f"unknown transfer_dtype '{transfer_dtype}'")
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.last_batch = last_batch
        self.prefetch = max(int(prefetch), 0)
        self.transfer_dtype = transfer_dtype
        self.framer = framer
        if frame_fn is None and framer is not None:
            frame_fn = framer.frame_host
        self.frame_fn = frame_fn
        if shard is not None:
            index, count = int(shard[0]), int(shard[1])
            if not (0 <= index < count):
                raise ValueError(f"shard index {index} out of range for count {count}")
            shard = (index, count)
        self.shard = shard
        self._epoch = 0

    def _shard_len(self) -> int:
        n = len(self.dataset)
        if self.shard is None:
            return n
        return -(-n // self.shard[1])  # ceil: equal length on every host

    def __len__(self) -> int:
        n = self._shard_len()
        if self.last_batch == "drop":
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _targets_batch(self, indices) -> Dict[str, np.ndarray]:
        ds = self.dataset
        tgt_items = []
        for i in indices:
            _, _, count = ds.audio_span(int(i))
            tgt_items.append(ds.targets(int(i), min(count, ds.clip_samples)))
        return {k: np.stack([t[k] for t in tgt_items]) for k in tgt_items[0]}

    def _framed_batch(self, indices) -> "Dict[str, np.ndarray] | None":
        """Native C++ decode straight into phase-grouped int16 frames — the
        device-ready layout; skips float decode, restack, quantize, and host
        framing (see data/native.py::load_batch_framed_i16)."""
        ds = self.dataset
        if (
            self.framer is None
            or self.transfer_dtype != "int16"
            or not (hasattr(ds, "load_audio_batch_framed") and hasattr(ds, "targets"))
        ):
            return None  # concat datasets span files across children; use slow path
        audio = ds.load_audio_batch_framed(indices, self.framer)
        if audio is None:
            return None
        batch = self._targets_batch(indices)
        batch["audio"] = audio
        return batch

    def _fast_batch(self, indices) -> "Dict[str, np.ndarray] | None":
        """Native C++ batch decode when available (see data/native.py)."""
        ds = self.dataset
        if not (hasattr(ds, "load_audio_batch") and hasattr(ds, "targets")):
            return None  # concat datasets span files across children; use slow path
        try:
            audio = ds.load_audio_batch(indices)
        except Exception:
            return None
        if audio is None:
            return None
        batch = self._targets_batch(indices)
        batch["audio"] = audio
        return batch

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(idx)
        if self.shard is not None:
            i, c = self.shard
            per = self._shard_len()
            if len(idx):  # wrap-pad so every host sees exactly `per` items
                idx = np.resize(idx, per * c)[i::c]
            else:
                idx = idx[:0]
        return idx

    def _i16_batch(self, indices) -> "Dict[str, np.ndarray] | None":
        """Native C++ decode to raw int16 waveforms — the minimum-byte
        transfer layout (best when host->device bandwidth bounds the step;
        docs/PERFORMANCE.md)."""
        ds = self.dataset
        if (
            self.transfer_dtype != "int16"
            or not (hasattr(ds, "load_audio_batch_i16") and hasattr(ds, "targets"))
        ):
            return None
        audio = ds.load_audio_batch_i16(indices)
        if audio is None:
            return None
        batch = self._targets_batch(indices)
        batch["audio"] = audio
        return batch

    def _make_batch(self, indices) -> Dict[str, np.ndarray]:
        batch = self._framed_batch(indices)
        if batch is None:
            # int16 transfers: native raw-i16 decode first (zero decode work
            # for mono PCM16) — with a frame_fn it also feeds the framer's
            # native int16 branch, skipping the float+quantize round trip
            batch = self._i16_batch(indices)
            if batch is None:
                batch = self._fast_batch(indices)
                if batch is None:
                    items = [self.dataset[int(i)] for i in indices]
                    batch = AudioDataset.collate(items)
                if self.transfer_dtype == "int16":
                    batch["audio"] = np.clip(
                        np.round(batch["audio"] * 32768.0), -32768, 32767
                    ).astype(np.int16)
            if self.frame_fn is not None:
                audio = batch["audio"]
                if audio.ndim == 3:
                    audio = audio[:, 0, :]
                batch["audio"] = self.frame_fn(audio)
        n = len(indices)
        if n < self.batch_size and self.last_batch == "pad":
            reps = self.batch_size - n

            def _pad(v):
                if isinstance(v, tuple):  # (q, scale) framed-int8 audio
                    return tuple(_pad(x) for x in v)
                return np.concatenate([v, np.repeat(v[-1:], reps, axis=0)], axis=0)

            batch = {k: _pad(v) for k, v in batch.items()}
            batch["valid"][n:] = False
            batch["clip_valid"] = np.arange(self.batch_size) < n
        elif self.last_batch == "pad":
            batch["clip_valid"] = np.ones(self.batch_size, bool)
        return batch

    def iter_spans(self):
        """One epoch's batch index spans (advancing the shuffle epoch) —
        shared by __iter__ and DeviceCachedLoader so both produce identical
        batch compositions."""
        order = self._order()
        self._epoch += 1
        spans = []
        for s in range(0, len(order), self.batch_size):
            span = order[s : s + self.batch_size]
            if len(span) < self.batch_size and self.last_batch == "drop":
                continue
            spans.append(span)
        return spans

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        spans = self.iter_spans()

        if self.prefetch == 0:
            for span in spans:
                yield self._make_batch(span)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for span in spans:
                    q.put(self._make_batch(span))
            except Exception as exc:  # surface worker errors to the consumer
                q.put(exc)
            q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, Exception):
                raise item
            yield item
        t.join()


class DeviceCachedLoader:
    """Device-resident dataset cache for small corpora.

    Ships every clip's audio to the device ONCE (in the wrapped loader's
    exact transfer layout: framed int16, raw int16, or float32) and
    reassembles each epoch's shuffled batches with an on-device gather, so
    per-epoch host->device traffic drops from the whole dataset to the
    target arrays (KBs). Batch compositions, shuffle order, padding policy
    and target handling are IDENTICAL to iterating the wrapped
    ``BatchLoader`` (it delegates to the same ``iter_spans``/target code).

    Motivation (docs/PERFORMANCE.md round 4): demo-scale training re-shipped
    ~170 MB/epoch through the tunnelled pipe; when the pipe degrades to a
    few MB/s that dominates wall time. A 48-clip demo dataset is ~127 MB
    framed int16 — cache it once and epochs become pure compute.

    Not for multi-host sharded loaders (each host owns a dataset slice that
    changes meaning per epoch) — ``wrap()`` refuses. HBM cost: the whole
    dataset in transfer dtype; gate with ``max_mb``.
    """

    def __init__(self, loader: BatchLoader):
        if loader.shard is not None:
            raise ValueError("DeviceCachedLoader does not support sharded loaders")
        import jax
        import jax.numpy as jnp

        self.loader = loader
        n = len(loader.dataset)
        # build the cache in index order using the loader's own batch path
        # (native framed/int16 decode etc.), batch by batch
        rows = []
        bs = loader.batch_size
        for s in range(0, n, bs):
            span = np.arange(s, min(s + bs, n))
            a = loader._make_batch(span)["audio"]
            if isinstance(a, tuple):  # (q, scale) framed-int8 audio
                rows.append(tuple(x[: len(span)] for x in a))
            else:
                rows.append(a[: len(span)])
        if rows and isinstance(rows[0], tuple):
            audio_all = tuple(
                np.concatenate([r[j] for r in rows], axis=0)
                for j in range(len(rows[0]))
            )
            self._tuple = True
        else:
            audio_all = np.concatenate(rows, axis=0)
            self._tuple = False
        self._cache = jax.device_put(audio_all)
        self._targets = loader._targets_batch(np.arange(n))
        self._gather = jax.jit(lambda c, i: jax.tree.map(
            lambda x: jnp.take(x, i, axis=0), c))

    def __len__(self) -> int:
        return len(self.loader)

    @property
    def nbytes(self) -> int:
        import jax

        return sum(int(x.size) * x.dtype.itemsize
                   for x in jax.tree.leaves(self._cache))

    def __iter__(self):
        import jax.numpy as jnp

        loader = self.loader
        for span in loader.iter_spans():
            idx = np.asarray(span, np.int32)
            n = len(idx)
            pad = 0
            if n < loader.batch_size and loader.last_batch == "pad":
                pad = loader.batch_size - n
                idx = np.concatenate([idx, np.repeat(idx[-1:], pad)])
            batch = {k: v[idx] for k, v in self._targets.items()}
            batch["audio"] = self._gather(self._cache, jnp.asarray(idx))
            if pad:
                batch["valid"] = batch["valid"].copy()
                batch["valid"][n:] = False
            if loader.last_batch == "pad":
                batch["clip_valid"] = np.arange(len(idx)) < n
            yield batch

    @classmethod
    def wrap_from_config(cls, loader: BatchLoader, tpu_cfg: dict):
        """The ONE home of the cache-enable policy shared by train.py,
        evaluate_model.py and the gate tools: ``device_cache_dataset`` =
        "auto" (default; cache when the dataset fits
        ``device_cache_max_mb``), "true"/"1"/"on" (cache regardless of
        size) or "false"/"0"/"off" (never)."""
        mode = str((tpu_cfg or {}).get("device_cache_dataset", "auto")).lower()
        if mode in ("false", "0", "off"):
            return loader
        max_mb = float((tpu_cfg or {}).get("device_cache_max_mb", 512.0))
        if mode in ("true", "1", "on"):
            max_mb = float("inf")
        return cls.wrap(loader, max_mb=max_mb)

    @classmethod
    def wrap(cls, loader: BatchLoader, max_mb: float = 512.0):
        """Return a device-cached view of ``loader`` when the dataset fits
        the budget (estimated in the transfer layout), else ``loader``
        unchanged. Never caches sharded (multi-host) loaders."""
        if loader.shard is not None or len(loader.dataset) == 0:
            return loader
        try:
            probe = loader._make_batch(np.arange(min(1, len(loader.dataset))))
        except Exception:
            return loader
        a = probe["audio"]
        leaves = a if isinstance(a, tuple) else (a,)
        est_mb = sum(x[:1].nbytes for x in leaves) * len(loader.dataset) / 1e6
        if est_mb > max_mb:
            return loader
        return cls(loader)
