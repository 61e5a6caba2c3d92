"""Evaluate a model on a dataset split (reference eval/eval_utils.lua:
eval_split, :22-91): per image, compute training losses AND test-time
predictions, feed the evaluator, return loss averages + mAP results."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..models import densecap
from ..utils.text import decode_sequence
from .evaluator import DenseCaptioningEvaluator


def eval_split(params, loader, cfg, split=1, max_images=-1, id="",
               loss_rng=None, verbose=True, beam_size=0):
    split_n = loader.split_size(split)
    n_images = split_n if max_images <= 0 else min(max_images, split_n)
    loader.reset_iterator(split)
    evaluator = DenseCaptioningEvaluator(id=id)
    idx_to_token = loader.idx_to_token()

    fwd_test = jax.jit(
        lambda p, im, h, w: densecap.forward_test(
            p, im, h, w, cfg, use_beam=beam_size)
    )
    fwd_loss = jax.jit(
        lambda p, im, h, w, gb, gl, gv, r: densecap.forward_train(
            p, im, h, w, gb, gl, gv, r, cfg
        )
    )
    rng = loss_rng if loss_rng is not None else jax.random.PRNGKey(0)

    all_losses = []
    for counter in range(n_images):
        ex = loader.get_example(split=split, iterate=True)
        im = jnp.asarray(ex["image"])
        h, w = jnp.float32(ex["height"]), jnp.float32(ex["width"])

        rng, sub = jax.random.split(rng)
        losses = fwd_loss(
            params, im, h, w, jnp.asarray(ex["gt_boxes"]),
            jnp.asarray(ex["gt_labels"]), jnp.asarray(ex["gt_valid"]), sub,
        )
        all_losses.append({k: float(v) for k, v in losses.items()})

        out = fwd_test(params, im, h, w)
        valid = np.asarray(out.valid)
        boxes = np.asarray(out.boxes)[valid]
        scores = np.asarray(out.scores)[valid]
        captions = decode_sequence(
            np.asarray(out.captions)[valid], idx_to_token, cfg.vocab_size
        )

        gv = np.asarray(ex["gt_valid"])
        gt_boxes = np.asarray(ex["gt_boxes"])[gv]
        gt_captions = decode_sequence(
            np.asarray(ex["gt_labels"])[gv], idx_to_token, cfg.vocab_size
        )
        evaluator.add_result(scores, boxes, captions, gt_boxes, gt_captions)

        if verbose:
            print(
                f"Processed image {ex['filename']} ({counter + 1}/"
                f"{n_images}) of split {split}, detected {len(boxes)} regions"
            )

    loss_results = {
        k: float(np.mean([d[k] for d in all_losses]))
        for k in all_losses[0]
    } if all_losses else {}
    ap_results = evaluator.evaluate()
    if verbose:
        print(f"mAP: {100 * ap_results['map']:.4f} "
              f"(caption scorer: {ap_results['score_method']})")
    return {"loss_results": loss_results, "ap_results": ap_results}
