"""Prefetching data loader over the shared-memory arena.

Native-runtime replacement for the reference's torch DataLoader worker pool
(classification/tool/train_cls_scanobjectnn.py:157-160, segmentation
tool/train.py:173-176): worker processes run the host-side NumPy pipeline
(augment, voxelize, crop, pad) and publish finished batches into a ring of
shared-memory slots; the training process consumes them zero-copy and ships
them straight to the device.  Workers never import JAX.
"""

import multiprocessing as mp
import queue as queue_mod

import numpy as np

from . import shm


class PrefetchLoader:
    """Ring-buffered multi-process batch loader.

    Args:
      make_batch: picklable callable (indices, seed) -> dict of np arrays
        with fixed shapes/dtypes (the padded batch).
      n_items: dataset length.
      batch_size: indices per batch.
      n_workers: worker process count (0 = synchronous in-process).
      n_slots: ring depth (>= 2 for overlap).
      seed: base seed; each batch gets seed + batch_index.
      shuffle, drop_last: epoch iteration controls.
    """

    def __init__(
        self,
        make_batch,
        n_items,
        batch_size,
        n_workers=2,
        n_slots=4,
        seed=0,
        shuffle=True,
        drop_last=True,
        name="loader",
    ):
        self.make_batch = make_batch
        self.n_items = n_items
        self.batch_size = batch_size
        self.n_workers = n_workers
        self.n_slots = max(2, n_slots) if n_workers else 1
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.name = name
        self._slots = None
        self._procs = []
        self._task_q = None
        self._done_q = None

    # -- slot management -------------------------------------------------
    def _slot_names(self, slot, keys):
        # pid-namespaced: concurrent runs must not share slots
        import os

        return {k: f"/rs_{os.getpid()}_{self.name}_{slot}_{k}" for k in keys}

    def _ensure_slots(self, template):
        if self._slots is not None:
            return
        self._slots = []
        for s in range(self.n_slots):
            names = self._slot_names(s, template.keys())
            views = {
                k: shm.create(names[k], np.zeros_like(v))
                for k, v in template.items()
            }
            self._slots.append(views)

    # -- worker ----------------------------------------------------------
    @staticmethod
    def _worker(make_batch, slot_specs, task_q, done_q):
        views_by_slot = {}
        while True:
            task = task_q.get()
            if task is None:
                return
            slot, indices, seed = task
            if slot not in views_by_slot:
                views_by_slot[slot] = {
                    k: shm.attach(name, writable=True)
                    for k, name in slot_specs[slot].items()
                }
            batch = make_batch(indices, seed)
            views = views_by_slot[slot]
            for k, v in batch.items():
                views[k][...] = v
            done_q.put(slot)

    def _start(self, template):
        self._ensure_slots(template)
        if self.n_workers == 0:
            return
        ctx = mp.get_context("fork")
        self._task_q = ctx.Queue()
        self._done_q = ctx.Queue()
        slot_specs = [
            self._slot_names(s, template.keys()) for s in range(self.n_slots)
        ]
        for _ in range(self.n_workers):
            p = ctx.Process(
                target=self._worker,
                args=(self.make_batch, slot_specs, self._task_q, self._done_q),
                daemon=True,
            )
            p.start()
            self._procs.append(p)

    # -- iteration -------------------------------------------------------
    def _batches_for_epoch(self, epoch):
        order = np.arange(self.n_items)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(order)
        stop = (
            self.n_items - self.n_items % self.batch_size
            if self.drop_last
            else self.n_items
        )
        return [
            order[s : s + self.batch_size] for s in range(0, stop, self.batch_size)
        ]

    def epoch(self, epoch_idx):
        """Yield batch dicts (shared-memory views; copy or upload before the
        next iteration reuses the slot)."""
        batches = self._batches_for_epoch(epoch_idx)
        if not batches:
            return
        if self._slots is None:
            template = self.make_batch(batches[0], self.seed)
            self._start(template)
            if self.n_workers == 0:
                yield template
                batches = batches[1:]

        if self.n_workers == 0:
            for i, idxs in enumerate(batches):
                yield self.make_batch(idxs, self.seed + epoch_idx * 100003 + i)
            return

        # pipeline: keep up to n_slots batches in flight
        inflight = 0
        next_batch = 0
        free = list(range(self.n_slots))
        while next_batch < len(batches) or inflight:
            while free and next_batch < len(batches):
                slot = free.pop()
                self._task_q.put(
                    (
                        slot,
                        batches[next_batch],
                        self.seed + epoch_idx * 100003 + next_batch,
                    )
                )
                next_batch += 1
                inflight += 1
            slot = self._done_q.get()
            inflight -= 1
            yield self._slots[slot]
            free.append(slot)

    def close(self):
        for _ in self._procs:
            self._task_q.put(None)
        for p in self._procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        self._procs = []
        if self._slots is not None:
            for s in range(self.n_slots):
                for name in self._slot_names(s, self._slots[s].keys()).values():
                    shm.unlink(name)
            self._slots = None
