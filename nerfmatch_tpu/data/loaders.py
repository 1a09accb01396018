"""Loader factory: dataset registry, multi-scene/mixed concat, batched
iteration with background prefetching.

Capability match for ``nerfmatch/data_loaders.py`` without torch: a dataset
registry resolved by ``config.dataset`` name, ``#scene`` wildcard expansion
into concatenated multi-scene datasets, mixed-dataset union, and a
thread-prefetching batch loader that stacks numpy samples (keeping TPUs fed
while PIL/np decode the next batch on the host).
"""

from __future__ import annotations

import queue
import threading
from argparse import Namespace

import numpy as np

from ..utils import get_logger, merge_configs

logger = get_logger(level="INFO", name="loader")


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, idx):
        d = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        return self.datasets[d][idx - int(self.offsets[d])]


def _collate(samples):
    """Stack a list of dict samples into batched numpy arrays (non-array
    values become lists)."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating, bool)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    """Minimal host loader: shuffled index order, dict-collation, optional
    background-thread prefetch (depth 2).

    Multi-host training: ``batch_size`` is the GLOBAL batch;
    ``process_index``/``process_count`` make each process load only its
    contiguous slice of every (identically shuffled — same seed on all
    processes) global batch.  ``parallel.mesh.shard_batch`` reassembles the
    global device array from the per-process shards."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 0, drop_last: bool = False, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        assert batch_size % process_count == 0, \
            f"global batch {batch_size} % processes {process_count} != 0"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = num_workers > 0
        self.process_index = process_index
        self.process_count = process_count
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            idx = self._rng.permutation(idx)
        end = (len(idx) // self.batch_size * self.batch_size
               if self.drop_last else len(idx))
        per = self.batch_size // self.process_count
        lo = self.process_index * per
        for i in range(0, end, self.batch_size):
            gbatch = idx[i : i + self.batch_size]
            if self.process_count > 1:
                gbatch = gbatch[lo : lo + per]
            yield gbatch

    def _produce(self, q, stop):
        # Dataset errors are forwarded to the consumer (a silent
        # end-of-epoch would truncate evals / desync multi-host steps);
        # `stop` lets an abandoned iterator release the thread instead of
        # blocking forever on a full queue.
        try:
            for batch_idx in self._index_batches():
                batch = _collate([self.dataset[int(i)] for i in batch_idx])
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(None)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    def __iter__(self):
        if not self.prefetch:
            for batch_idx in self._index_batches():
                yield _collate([self.dataset[int(i)] for i in batch_idx])
            return
        q = queue.Queue(maxsize=2)
        stop = threading.Event()
        t = threading.Thread(target=self._produce, args=(q, stop),
                             daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def _dataset_registry():
    from . import match_dataset, nerf_dataset

    return {
        "NerfBaseDataset": nerf_dataset.NerfBaseDataset,
        "NeRFMatchBase": match_dataset.NeRFMatchBase,
        "NeRFMatchPair": match_dataset.NeRFMatchPair,
        "NeRFMatchMultiPair": match_dataset.NeRFMatchMultiPair,
    }


def init_multiscene_dataset(config, split: str = "train", concat: bool = True,
                            debug: bool = False):
    """Expand ``config.scenes`` with ``#scene`` wildcard substitution."""
    ms = []
    for scene in config.scenes:
        sconf = {"scene": scene}
        for k, v in vars(config).items():
            if k == "scenes":
                continue
            if k in ["scene_dir", "train_pair_txt", "test_pair_txt"] and \
                    isinstance(v, str) and "#" in v:
                sconf[k] = v.replace("#scene", scene)
            else:
                sconf[k] = v
        cls = _dataset_registry()[config.dataset]
        ms.append(cls(Namespace(**sconf), split=split, debug=debug))
    if not concat:
        return ms
    return ConcatDataset(ms)


def init_mixed_dataset(config, split: str = "train", concat: bool = True,
                       debug: bool = False):
    mixed = []
    for _, dt_config in vars(config.datasets).items():
        mixed += init_multiscene_dataset(
            merge_configs(config, dt_config), split=split, concat=False,
            debug=debug)
    if not concat:
        return mixed
    return ConcatDataset(mixed)


def init_data_loader(config, num_workers: int = 1, batch_size: int = 1,
                     split: str = "train", debug: bool = False):
    if hasattr(config, "datasets"):
        dataset = init_mixed_dataset(config, split=split, debug=debug)
    elif hasattr(config, "scenes"):
        dataset = init_multiscene_dataset(config, split=split, debug=debug)
    else:
        dataset = _dataset_registry()[config.dataset](config, split=split,
                                                      debug=debug)
    if split == "train":
        from ..parallel.distributed import process_info

        pid, pcount = process_info()
        return DataLoader(dataset, batch_size=batch_size, shuffle=True,
                          num_workers=num_workers, drop_last=True,
                          process_index=pid, process_count=pcount)
    return DataLoader(dataset, batch_size=1, shuffle=False,
                      num_workers=num_workers)
