"""Serving engine: persistent compiled model + request pipeline.

Replaces the reference's webcam daemon (webcam/daemon.lua:55-103 — a
poll loop over a shared directory) with an in-process engine: one
compiled inference program, a request queue, and box rescaling to the
client's original coordinates. Includes the temporal smoothing of the
live demo (webcam/single_machine_demo.lua:137-171): boxes matched by
IoU to the previous frame keep their identity (stable colors client
side).
"""

from __future__ import annotations

import threading

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DenseCapConfig
from ..models import densecap
from ..ops.boxes import iou_cwh
from ..utils.image import preprocess_for_model
from ..utils.text import decode_sequence


class TemporalSmoother:
    """IoU-based box identity tracking across frames.

    Mirrors single_machine_demo.lua:137-171: each new box takes the id
    of its best-IoU match (> thresh) among the previous frame's boxes;
    unmatched boxes get fresh ids.
    """

    def __init__(self, iou_thresh=0.5):
        self.iou_thresh = iou_thresh
        self.prev_boxes = None
        self.prev_ids = None
        self.next_id = 0

    def assign_ids(self, boxes):
        n = len(boxes)
        ids = np.full(n, -1, dtype=np.int64)
        if self.prev_boxes is not None and len(self.prev_boxes) and n:
            ious = np.asarray(
                iou_cwh(jnp.asarray(boxes), jnp.asarray(self.prev_boxes))
            )
            taken = set()
            # greedy by IoU, best matches first
            flat = np.argsort(-ious, axis=None)
            for f in flat:
                i, j = divmod(int(f), ious.shape[1])
                if ious[i, j] <= self.iou_thresh:
                    break
                if ids[i] == -1 and j not in taken:
                    ids[i] = self.prev_ids[j]
                    taken.add(j)
        for i in range(n):
            if ids[i] == -1:
                ids[i] = self.next_id
                self.next_id += 1
        self.prev_boxes = boxes.copy() if n else np.zeros((0, 4))
        self.prev_ids = ids
        return ids


class InferenceEngine:
    def __init__(self, params, cfg: DenseCapConfig, idx_to_token,
                 max_boxes=50, smoothing=True):
        self.params = jax.device_put(params)
        self.cfg = cfg
        self.idx_to_token = idx_to_token
        self.max_boxes = max_boxes
        self.smoother = TemporalSmoother() if smoothing else None
        self.lock = threading.Lock()

        self._fwd = jax.jit(
            lambda p, im, h, w: densecap.forward_test(p, im, h, w, cfg)
        )

    def warmup(self):
        S = self.cfg.image_size
        self.process_array(np.zeros((S, S, 3), np.uint8))

    def process_array(self, rgb):
        """(H, W, 3) uint8 RGB -> dict of boxes/scores/captions.

        Boxes are returned in the ORIGINAL image's xywh coordinates
        (daemon.lua:78-90 rescales the same way).
        """
        canvas, h, w, scale = preprocess_for_model(
            rgb, self.cfg.image_size
        )
        with self.lock:
            out = self._fwd(
                self.params, jnp.asarray(canvas), jnp.float32(h),
                jnp.float32(w),
            )
            valid = np.asarray(out.valid)
            boxes = np.asarray(out.boxes)[valid][: self.max_boxes]
            scores = np.asarray(out.scores)[valid][: self.max_boxes]
            captions = decode_sequence(
                np.asarray(out.captions)[valid][: self.max_boxes],
                self.idx_to_token, self.cfg.vocab_size,
            )

        ids = (self.smoother.assign_ids(boxes)
               if self.smoother else np.arange(len(boxes)))

        # canvas xcycwh -> original-image xywh
        xywh = np.zeros_like(boxes)
        xywh[:, 0] = (boxes[:, 0] - (boxes[:, 2] - 1) / 2 - 1) / scale + 1
        xywh[:, 1] = (boxes[:, 1] - (boxes[:, 3] - 1) / 2 - 1) / scale + 1
        xywh[:, 2] = boxes[:, 2] / scale
        xywh[:, 3] = boxes[:, 3] / scale
        return {
            "boxes": xywh.tolist(),
            "scores": scores.tolist(),
            "captions": captions,
            "ids": ids.tolist(),
        }
