"""Host input pipeline: collate view items into AugBranch batches, with a
threaded prefetch loader.

Replaces torch DataLoader + default_collate (ref: tools/train_3d.py:105-111).
Workers are python threads (cv2/numpy release the GIL in the hot paths);
batches are fixed-shape AugBranch pytrees, optionally device_put with a
sharding for SPMD training.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from selfpose3d_tpu.data.structures import AugBranch
from selfpose3d_tpu.geometry.cameras import CameraParams


def collate_branch(view_items_per_sample: Sequence[Sequence[dict]]) -> AugBranch:
    """Stack per-sample, per-view item dicts into one AugBranch.

    Args:
      view_items_per_sample: [sample][view] -> dict from a dataset's
        ``_build_view_item`` (keys: image, target_2d, weights_2d, target_3d,
        trans, orig_wh, camera, joints, joints_vis, roots_3d, num_person,
        optional input_heatmap, hflip).
    """
    B = len(view_items_per_sample)
    V = len(view_items_per_sample[0])

    def stack(key, per_view=True):
        if per_view:
            first = view_items_per_sample[0][0].get(key)
            if first is None:
                return None
            return np.stack(
                [np.stack([s[v][key] for v in range(V)]) for s in view_items_per_sample]
            )
        first = view_items_per_sample[0][0].get(key)
        if first is None:
            return None
        return np.stack([s[0][key] for s in view_items_per_sample])

    cams = {}
    for field in ("R", "T", "fx", "fy", "cx", "cy", "k", "p"):
        cams[field] = np.stack(
            [
                np.stack([np.asarray(s[v]["camera"][field], np.float32) for v in range(V)])
                for s in view_items_per_sample
            ]
        )
    cam = CameraParams(
        R=jnp.asarray(cams["R"].reshape(B, V, 3, 3)),
        T=jnp.asarray(cams["T"].reshape(B, V, 3, 1)),
        f=jnp.asarray(
            np.stack([cams["fx"].reshape(B, V), cams["fy"].reshape(B, V)], -1)
        ),
        c=jnp.asarray(
            np.stack([cams["cx"].reshape(B, V), cams["cy"].reshape(B, V)], -1)
        ),
        k=jnp.asarray(cams["k"].reshape(B, V, 3)),
        p=jnp.asarray(cams["p"].reshape(B, V, 2)),
    )

    images = stack("image")
    input_heatmaps = stack("input_heatmap")
    hflip = np.array(
        [bool(s[0].get("hflip", False)) for s in view_items_per_sample]
    )

    def j(x):
        return None if x is None else jnp.asarray(x)

    return AugBranch(
        cam=cam,
        trans=j(stack("trans")),
        orig_wh=j(stack("orig_wh")),
        hflip=jnp.asarray(hflip),
        views=j(images),
        input_heatmaps=j(input_heatmaps),
        target_2d=j(stack("target_2d")),
        weights_2d=j(stack("weights_2d")),
        target_3d=j(stack("target_3d", per_view=False)),
        joints=j(stack("joints")),
        joints_vis=j(stack("joints_vis")),
        joints_3d=j(stack("joints_3d", per_view=False)),
        joints_3d_vis=j(stack("joints_3d_vis", per_view=False)),
        roots_3d=j(stack("roots_3d", per_view=False)),
        num_person=j(
            np.array([s[0]["num_person"] for s in view_items_per_sample], np.int32)
        ),
    )


class PrefetchLoader:
    """Threaded batch loader with bounded prefetch.

    ``make_batch(indices) -> batch`` runs in worker threads; batches come out
    in submission order.

    Multi-host: when ``process_count > 1`` every host draws the *same*
    shuffled order (identical seed) and keeps its ``process_index``-th stripe,
    so data-parallel hosts consume disjoint data (SURVEY §2.7 "per-host input
    pipelines"); ``batch_size`` is the per-host batch. Defaults come from
    ``jax.process_index()/process_count()`` — single-host runs see stride 1
    and behave exactly as before.
    """

    def __init__(
        self,
        num_samples: int,
        batch_size: int,
        make_batch: Callable[[List[int]], object],
        shuffle: bool = False,
        num_workers: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = False,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.make_batch = make_batch
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.process_index = process_index
        self.process_count = max(1, process_count)
        self._epoch = 0

    @property
    def _local_samples(self) -> int:
        n, r = divmod(self.num_samples, self.process_count)
        return n + (1 if self.process_index < r else 0)

    def __len__(self):
        if self.drop_last:
            return self._local_samples // self.batch_size
        return (self._local_samples + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        order = np.arange(self.num_samples)
        if self.shuffle:
            # same seed on every host -> identical global order -> disjoint
            # per-host stripes
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        order = order[self.process_index :: self.process_count]
        self._epoch += 1

        batches = [
            order[i : i + self.batch_size].tolist()
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        results = {}
        emit_cv = threading.Condition()
        # bounds how far workers run ahead of the consumer
        slots = threading.Semaphore(self.prefetch + self.num_workers)

        task_q: "queue.Queue" = queue.Queue()
        for bi, idxs in enumerate(batches):
            task_q.put((bi, idxs))

        def worker():
            while True:
                slots.acquire()
                try:
                    bi, idxs = task_q.get_nowait()
                except queue.Empty:
                    slots.release()
                    return
                try:
                    batch = self.make_batch(idxs)
                except Exception as e:  # surface errors to the consumer
                    batch = e
                with emit_cv:
                    results[bi] = batch
                    emit_cv.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        for bi in range(len(batches)):
            with emit_cv:
                while bi not in results:
                    emit_cv.wait(timeout=1.0)
                batch = results.pop(bi)
            slots.release()
            if isinstance(batch, Exception):
                raise batch
            yield batch
