"""Host-side dataset loader producing padded, fixed-shape device batches.

Re-design of reference densecap/DataLoader.lua for a batched TPU input
pipeline: where the reference returns ONE image with its exact region
count per step (DataLoader.lua:144-217, forcing the model's N == 1
restriction), this loader pads everything to static shapes:

  * image: the full S x S canvas from the h5 (the reference crops to the
    true extent; we keep the canvas — one compiled program),
  * gt boxes/labels: padded to max_gt_boxes with a validity mask
    (uniformly subsampled when an image has more — the sampler only
    needs IoU targets, so subsampling changes nothing but tail regions),
  * batches of B images for data-parallel training.

A double-buffered background thread hides h5 read + VGG-mean subtract
behind device compute (replacing the reference's synchronous
getBatch-in-the-train-loop, train.lua:71-75).
"""

from __future__ import annotations

import json
import queue
import threading

import numpy as np

from ..config import VGG_MEAN_BGR


class DenseCapLoader:
    """Reads the preprocessed HDF5 + dicts json (schema: preprocess.py)."""

    def __init__(self, h5_path, json_path, max_gt_boxes=128, seed=0,
                 proposals_h5=None, shard=None, raw_images=False):
        """shard: optional (process_id, num_processes) — this loader
        then sees only every num_processes-th example of each split
        (round-robin), the per-host feeding half of the multi-host
        recipe (parallel/distributed.py).

        raw_images=True returns images as the h5's raw uint8 (HWC view,
        no float convert / mean-subtract / pad-zeroing on host) — the
        TPU-first feed: the train step normalizes ON DEVICE
        (parallel/train_step.py:normalize_uint8_images), XLA fuses it
        into the first conv's input, and the host pipeline moves 4x
        fewer bytes (1.5 MB/image over the transfer instead of 6.2 MB).
        Measured: the f32 host path sustains only ~60 img/s at 720px —
        below the 120 img/s device step — while raw uint8 feeds it with
        headroom (doc/BENCH.md round 5)."""
        import h5py

        self.h5 = h5py.File(h5_path, "r")
        # optional external region proposals (reference
        # DataLoader.lua:47-52; the reference loads these but its model
        # never consumes them — kept for schema parity)
        self.obj_h5 = h5py.File(proposals_h5, "r") if proposals_h5 \
            else None
        with open(json_path) as f:
            self.info = json.load(f)
        self.max_gt_boxes = max_gt_boxes
        self.raw_images = raw_images
        self.rng = np.random.RandomState(seed)

        # index arrays in RAM (DataLoader.lua:29-43)
        self.image_heights = self.h5["image_heights"][:]
        self.image_widths = self.h5["image_widths"][:]
        self.original_heights = self.h5["original_heights"][:]
        self.original_widths = self.h5["original_widths"][:]
        self.boxes = self.h5["boxes"][:].astype(np.float32)
        self.labels = self.h5["labels"][:].astype(np.int32)
        self.img_to_first_box = self.h5["img_to_first_box"][:]
        self.img_to_last_box = self.h5["img_to_last_box"][:]
        split = self.h5["split"][:]
        self.split_ix = {
            s: np.nonzero(split == s)[0] for s in (0, 1, 2)
        }
        if shard is not None:
            pid, nproc = shard
            assert 0 <= pid < nproc, shard
            self.split_ix = {
                s: ix[pid::nproc] for s, ix in self.split_ix.items()
            }
        self.iterators = {0: 0, 1: 0, 2: 0}
        self.num_channels = 3
        self.canvas = self.h5["images"].shape[2]
        self.vgg_mean = np.asarray(VGG_MEAN_BGR, dtype=np.float32
                                   ).reshape(3, 1, 1)

    # -- reference API surface (DataLoader.lua:90-106) -------------------
    def vocab_size(self):
        return len(self.info["token_to_idx"])

    def seq_length(self):
        return self.labels.shape[1]

    def idx_to_token(self):
        return {int(k): v for k, v in self.info["idx_to_token"].items()}

    def reset_iterator(self, split):
        self.iterators[split] = 0

    def split_size(self, split):
        return len(self.split_ix[split])

    # --------------------------------------------------------------------
    def _load_image(self, ix):
        """Canvas image (S, S, 3) float32 HWC BGR, mean-subtracted.

        Padding convention: ZERO after mean subtraction — identical to
        the serving path (utils/image.py:preprocess_for_model), so a
        model sees the same boundary statistics in training and
        inference. (The h5 stores zero PIXELS in the pad region; naive
        whole-canvas subtraction would leave -mean there. Measured
        consequence of mixing the two conventions: see
        doc/DESIGN.md 'Canvas boundary effects'.)
        """
        chw = self.h5["images"][ix]                     # (3, S, S) BGR
        if self.raw_images:
            # uint8 HWC view; convert/mean-sub/pad-mask happen on
            # device (train_step.normalize_uint8_images) — the h5 pad
            # region is zero PIXELS, which that helper re-zeroes after
            # mean subtraction, reproducing this f32 path exactly.
            return chw.transpose(1, 2, 0)
        chw = chw.astype(np.float32)
        chw -= self.vgg_mean
        img = np.ascontiguousarray(chw.transpose(1, 2, 0))
        h = int(self.image_heights[ix])
        w = int(self.image_widths[ix])
        img[h:, :, :] = 0.0
        img[:, w:, :] = 0.0
        return img

    def example_meta(self, split, ri):
        """(height, width) on the canvas at position ri of a split —
        metadata only, no image IO. The bucket schedule runs on this so
        every multi-host process can compute the identical global
        schedule without touching pixels (BucketedLoader)."""
        ix = int(self.split_ix[split][ri])
        return int(self.image_heights[ix]), int(self.image_widths[ix])

    def get_example(self, split=0, iterate=True):
        """One padded example dict (host numpy)."""
        ix_list = self.split_ix[split]
        assert len(ix_list), "split is empty"
        if iterate:
            ri = self.iterators[split]
            self.iterators[split] = (ri + 1) % len(ix_list)
        else:
            ri = self.rng.randint(len(ix_list))
        return self.get_example_at(split, ri)

    def get_example_at(self, split, ri):
        """The example at a SPECIFIC split position, without touching
        the split iterator (bucket-schedule materialization)."""
        ix_list = self.split_ix[split]
        ix = int(ix_list[ri])

        img = self._load_image(ix)
        h = float(self.image_heights[ix])
        w = float(self.image_widths[ix])

        r0 = int(self.img_to_first_box[ix]) - 1  # 1-indexed inclusive
        r1 = int(self.img_to_last_box[ix])
        boxes = self.boxes[r0:r1]
        labels = self.labels[r0:r1]
        G = self.max_gt_boxes
        n = len(boxes)
        if n > G:
            keep = self.rng.choice(n, G, replace=False)
            keep.sort()
            boxes, labels = boxes[keep], labels[keep]
            n = G
        gt_boxes = np.zeros((G, 4), np.float32)
        gt_labels = np.zeros((G, self.seq_length()), np.int32)
        gt_boxes[:n] = boxes
        gt_labels[:n] = labels
        gt_valid = np.arange(G) < n

        out = {
            "image": img,
            "height": np.float32(h),
            "width": np.float32(w),
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_valid": gt_valid,
            "ix": ix,
            "filename": self.info["idx_to_filename"].get(str(ix + 1)),
            "split_pos": (ri, len(ix_list)),
        }
        if self.obj_h5 is not None:
            p0 = int(self.obj_h5["img_to_first_box"][ix]) - 1
            p1 = int(self.obj_h5["img_to_last_box"][ix])
            props = self.obj_h5["boxes"][p0:p1].astype(np.float32)
            # scale (x, y, w, h) proposals into resized-image coords and
            # convert to xcycwh (DataLoader.lua:203-214)
            frac = w / float(self.original_widths[ix])
            props[:, :2] = (props[:, :2] - 1) * frac + 1
            props[:, 2:4] = props[:, 2:4] * frac
            props[:, 0] += props[:, 2] / 2.0
            props[:, 1] += props[:, 3] / 2.0
            out["region_proposals"] = props
        return out

    def get_batch(self, batch_size=1, split=0, iterate=True):
        """Stacked batch of padded examples."""
        exs = [self.get_example(split, iterate) for _ in range(batch_size)]
        batch = {
            k: np.stack([e[k] for e in exs])
            for k in ("image", "height", "width", "gt_boxes", "gt_labels",
                      "gt_valid")
        }
        batch["ix"] = [e["ix"] for e in exs]
        batch["filename"] = [e["filename"] for e in exs]
        return batch


class BucketedLoader:
    """Canvas-bucketed batching: recover padded-square FLOP waste.

    The fixed S x S canvas wastes up to ~33% conv FLOPs on portrait /
    landscape images. Buckets are (bh, bw) canvas shapes; each image is
    cropped (top-left content is preserved — the h5 canvas is top-left
    aligned) to the smallest bucket that fits its true extent, and
    batches are formed per bucket. Each bucket shape compiles its own
    XLA program once (jax.jit specializes on shapes automatically).

    Tail handling (nothing is ever dropped or stranded): when the
    underlying split wraps around (epoch boundary), all pending
    examples — which always fit the full-square fallback bucket — are
    flushed as full-canvas batches; a final partial batch is padded by
    repeating examples with per-example weight 0, so every example in a
    finite split is trained EXACTLY once per epoch (batches carry a
    'weight' vector the train step uses for the loss mean).

    Multi-host: the SCHEDULE (which example lands in which
    bucket/batch/slot) is computed from metadata only
    (loader.example_meta — heights/widths live in RAM on every host),
    so with shard=(process_id, num_processes) every process runs the
    identical deterministic state machine over the same UNSHARDED
    split and materializes only its own contiguous slice of each
    global batch. All hosts therefore agree on every step's bucket
    shape with ZERO communication — the cross-host agreement protocol
    is "replay the same pure function of shared data".
    """

    def __init__(self, loader: DenseCapLoader, buckets, batch_size,
                 split=0, iterate=True, shard=None, seed=0):
        """batch_size is the GLOBAL batch when shard is given (the
        loader must then be unsharded); this process materializes
        batch_size // num_processes examples per batch."""
        S = loader.canvas
        self.loader = loader
        # always include the full square as the fallback bucket
        bl = sorted(set(tuple(b) for b in buckets) | {(S, S)},
                    key=lambda b: b[0] * b[1])
        self.buckets = bl
        self.batch_size = batch_size
        self.split = split
        self.iterate = iterate
        self.shard = shard
        if shard is not None:
            pid, nproc = shard
            assert 0 <= pid < nproc and batch_size % nproc == 0, \
                (shard, batch_size)
        # iterate=False sampling uses an OWN seeded rng (not the
        # loader's) so shard replicas draw the same sequence
        self.rng = np.random.RandomState(seed)
        self.pos = 0
        self.pending = {b: [] for b in self.buckets}  # split positions
        self._flush_queue = []

    def _bucket_for(self, h, w):
        for bh, bw in self.buckets:
            if h <= bh and w <= bw:
                return (bh, bw)
        return self.buckets[-1]

    def _padded(self, ris):
        """Repeat-pad a partial batch; weight 0 marks the repeats."""
        n_real = len(ris)
        weight = np.ones(self.batch_size, np.float32)
        out = list(ris)
        while len(out) < self.batch_size:
            weight[len(out)] = 0.0
            out.append(out[len(out) % n_real])
        return out, weight

    def _flush_pending(self):
        """Epoch boundary: drain every bucket through the full square."""
        leftovers = []
        for b in self.buckets:
            leftovers.extend(self.pending[b])
            self.pending[b] = []
        full = self.buckets[-1]
        while leftovers:
            ris, leftovers = (leftovers[:self.batch_size],
                              leftovers[self.batch_size:])
            ris, weight = self._padded(ris)
            self._flush_queue.append((full, ris, weight))

    def _schedule_next(self):
        """Next (bucket, split positions, weights) — metadata only."""
        while True:
            if self._flush_queue:
                return self._flush_queue.pop(0)
            n = self.loader.split_size(self.split)
            assert n, "split is empty"
            if self.iterate:
                ri = self.pos
                self.pos = (self.pos + 1) % n
            else:
                ri = int(self.rng.randint(n))
            h, w = self.loader.example_meta(self.split, ri)
            b = self._bucket_for(h, w)
            self.pending[b].append(ri)
            full_bucket = None
            if len(self.pending[b]) == self.batch_size:
                ris, self.pending[b] = self.pending[b], []
                full_bucket = (b, ris,
                               np.ones(self.batch_size, np.float32))
            # epoch wrap next call -> queue the tail flush AFTER any
            # just-completed batch
            if self.iterate and ri == n - 1:
                if full_bucket is not None:
                    self._flush_queue.append(full_bucket)
                    full_bucket = None
                self._flush_pending()
            if full_bucket is not None:
                return full_bucket

    def next_batch(self):
        """Returns (bucket_shape, batch dict) with images cropped to the
        bucket canvas. Batches include 'weight' (0 for repeat padding)
        and 'ix' (the real examples' dataset indices). Under shard the
        batch holds only this process's slice of the global batch."""
        bucket, ris, weight = self._schedule_next()
        bh, bw = bucket
        if self.shard is not None:
            pid, nproc = self.shard
            lb = self.batch_size // nproc
            sel = slice(pid * lb, (pid + 1) * lb)
        else:
            sel = slice(0, self.batch_size)
        local, wloc = ris[sel], weight[sel]
        exs = [self.loader.get_example_at(self.split, ri) for ri in local]
        batch = {
            "image": np.stack([e["image"][:bh, :bw] for e in exs]),
            "height": np.stack([e["height"] for e in exs]),
            "width": np.stack([e["width"] for e in exs]),
            "gt_boxes": np.stack([e["gt_boxes"] for e in exs]),
            "gt_labels": np.stack([e["gt_labels"] for e in exs]),
            "gt_valid": np.stack([e["gt_valid"] for e in exs]),
            "weight": wloc,
            "ix": [e["ix"] for e, wv in zip(exs, wloc) if wv > 0],
        }
        return bucket, batch


class PrefetchingLoader:
    """Background-thread batch prefetcher (depth-2 pipeline).

    Accepts either a DenseCapLoader (classic padded square batches) or
    ANY zero-arg callable producing a batch — e.g. a BucketedLoader's
    next_batch — so bucketing and prefetch compose instead of being
    mutually exclusive.
    """

    def __init__(self, loader=None, batch_size=None, split=0,
                 iterate=True, depth=2, source=None):
        if source is None:
            assert loader is not None and batch_size is not None
            self.loader = loader

            def source():
                return loader.get_batch(batch_size, split, iterate)

        self.q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def worker():
            while not self._stop.is_set():
                batch = source()
                while not self._stop.is_set():
                    try:
                        self.q.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def next(self):
        return self.q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        # Join the worker: a daemon thread mid-h5-read at interpreter
        # exit can deadlock against h5py's atexit file close (HDF5
        # global lock) — measured as a hard hang after the final print.
        self.thread.join(timeout=10.0)
