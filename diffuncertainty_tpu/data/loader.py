"""Host-side batch loader with threaded prefetch and static shapes.

Replaces the torch DataLoader worker pool (``data/torch_dataloader.py``) with
a thread-pool npy reader + double-buffered prefetch queue. Batches are
numpy dicts; callers ``jax.device_put`` (or donate into a jitted step).

XLA-friendly invariants:
- every batch has the SAME static shape: the final partial batch is padded to
  ``batch_size`` and carries a ``valid`` bool mask, so the train/infer step
  compiles exactly once;
- the rater axis is padded to the dataset's rater count (the reference pads
  variable-rater batches in ``collate_multirater_batch``); ``num_raters``
  carries the true per-sample count.
- shuffling is deterministic per (seed, epoch), like the reference's seeded
  worker/epoch discipline.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

from .dataset import MultiRaterDataset
from . import native_loader


class BatchLoader:
    def __init__(
        self,
        dataset: MultiRaterDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch: int = 2,
        use_native: bool = True,
        process_shard: tuple[int, int] | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0
        # multi-host input sharding (parallel/distributed.py::loader_shard):
        # (process_index, process_count). Each process iterates a disjoint
        # strided slice of the (shared, seed+epoch-deterministic) sample
        # order; slices are wrap-padded to equal length so every process
        # runs the SAME number of steps — the SPMD lockstep requirement.
        # batch_size here is the PER-PROCESS (host-local) batch size.
        if process_shard is not None:
            idx, count = process_shard
            if not (0 <= idx < count):
                raise ValueError(f"process_shard index {idx} not in [0, {count})")
        self.process_shard = process_shard
        # native C++ batch reader fast path: only for plain MultiRaterDataset
        # trees with uniform shapes (probed lazily on the first batch)
        self._native = (
            use_native
            and type(dataset) is MultiRaterDataset
            and native_loader.native_available()
        )
        self._native_shapes = None  # (img_slot_shape, mask_hw, replicate)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _local_count(self) -> int:
        n = len(self.dataset)
        if self.process_shard is None:
            return n
        _, count = self.process_shard
        return (n + count - 1) // count  # wrap-padded equal share

    def __len__(self) -> int:
        n = self._local_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # seeded by (seed, epoch) only — every process computes the SAME
            # global permutation before taking its strided slice
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        if self.process_shard is not None:
            pidx, count = self.process_shard
            local = idx[pidx::count]
            want = self._local_count()
            if len(local) < want:  # wrap-pad from the global order
                local = np.concatenate([local, idx[: want - len(local)]])
            idx = local
        return idx

    def _collate(self, samples: list[dict], valid_count: int) -> dict:
        bs = self.batch_size
        first = samples[0]
        images = np.stack([s["image"] for s in samples])
        segs = [np.asarray(s["seg"]) for s in samples]
        if segs[0].ndim == 3:  # all-raters mode: pad rater axis
            max_r = max(s.shape[0] for s in segs)
            padded = []
            for s in segs:
                if s.shape[0] < max_r:
                    pad = np.zeros((max_r - s.shape[0],) + s.shape[1:], s.dtype)
                    s = np.concatenate([s, pad], axis=0)
                padded.append(s)
            seg = np.stack(padded)
            num_raters = np.asarray([s.shape[0] for s in segs], np.int32)
        else:
            seg = np.stack(segs)
            num_raters = np.ones(len(segs), np.int32)

        valid = np.zeros(bs, bool)
        valid[:valid_count] = True
        if len(samples) < bs:  # pad to static batch size by repeating sample 0
            reps = bs - len(samples)
            images = np.concatenate([images, np.repeat(images[:1], reps, axis=0)])
            seg = np.concatenate([seg, np.repeat(seg[:1], reps, axis=0)])
            num_raters = np.concatenate([num_raters, np.repeat(num_raters[:1], reps)])
        return {
            "image": images.astype(np.float32),
            "seg": seg.astype(np.int32),
            "num_raters": num_raters,
            "valid": valid,
            "image_id": [s["image_id"] for s in samples],
            "dataset": [s["dataset"] for s in samples],
        }

    def _try_native_batch(self, idxs, rng) -> dict | None:
        """C++ thread-pool read of a whole batch; None -> python fallback."""
        ds = self.dataset
        try:
            if self._native_shapes is None:
                probe = ds.load(0)
                img = probe["image"]
                raw = np.load(ds.image_paths[0], mmap_mode="r")
                replicate = raw.ndim == 2 and img.shape[-1] == 3
                self._native_shapes = (raw.shape, probe["seg"].shape[-2:], replicate)
            raw_shape, mask_hw, replicate = self._native_shapes

            img_paths = [ds.image_paths[i] for i in idxs]
            images = native_loader.load_batch(
                img_paths, raw_shape, dtype="float32", num_threads=self.num_workers
            )
            if replicate:
                images = np.repeat(images[..., None], 3, axis=-1)
            elif images.ndim == 3:
                images = images[..., None]

            if ds.return_all_raters:
                flat_paths = []
                counts = []
                for i in idxs:
                    flat_paths.extend(ds.label_paths[i])
                    counts.append(len(ds.label_paths[i]))
                if len(set(counts)) != 1:
                    return None  # variable rater counts -> python path
                r = counts[0]
                masks = native_loader.load_batch(
                    flat_paths, mask_hw, dtype="int32", num_threads=self.num_workers
                ).reshape(len(idxs), r, *mask_hw)
                segs = [masks[j] for j in range(len(idxs))]
            else:
                sel_paths = []
                for i in idxs:
                    paths = ds.label_paths[i]
                    if ds.single_rater:
                        ridx = ds.stable_rater_index(ds.image_ids[i], len(paths))
                    else:
                        ridx = int(rng.integers(len(paths)))
                    sel_paths.append(paths[ridx])
                masks = native_loader.load_batch(
                    sel_paths, mask_hw, dtype="int32", num_threads=self.num_workers
                )
                segs = [masks[j] for j in range(len(idxs))]
            samples = [
                {
                    "image": images[j],
                    "seg": segs[j],
                    "image_id": ds.image_ids[i],
                    "dataset": ds.sample_datasets[i],
                }
                for j, i in enumerate(idxs)
            ]
            return self._collate(samples, valid_count=len(idxs))
        except Exception:
            self._native = False  # permanent fallback for this loader
            return None

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        rng = np.random.default_rng((self.seed, self._epoch, 1))
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        self._epoch += 1

        def load_batch(idxs):
            if self._native:
                batch = self._try_native_batch(idxs, rng)
                if batch is not None:
                    return batch
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                child_rngs = [np.random.default_rng(rng.integers(2**63)) for _ in idxs]
                samples = list(
                    pool.map(lambda a: self.dataset.load(a[0], a[1]), zip(idxs, child_rngs))
                )
            return self._collate(samples, valid_count=len(idxs))

        # simple lookahead prefetch
        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            futures = []
            for b in batches[: self.prefetch]:
                futures.append(prefetcher.submit(load_batch, b))
            next_submit = self.prefetch
            for i in range(len(batches)):
                batch = futures[i].result()
                if next_submit < len(batches):
                    futures.append(prefetcher.submit(load_batch, batches[next_submit]))
                    next_submit += 1
                yield batch
