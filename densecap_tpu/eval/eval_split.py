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
               loss_rng=None, verbose=True, beam_size=0,
               compute_losses=True, batch_size=1, mesh=None,
               canvas_buckets=None):
    """Evaluate `params` on a split.

    compute_losses=False skips the per-image training-loss pass (the
    reference always runs it, eval_utils.lua:58, but it only feeds the
    printed loss stats). batch_size > 1 runs the test pass batched
    (forward_test_batch) — ~B x fewer dispatches; implies
    compute_losses=False.

    mesh: optional ('data', 'model') Mesh — the batched test pass then
    runs data-parallel: params replicated, the batch sharded over
    'data', XLA splits the program across devices (requires batch_size
    to be a multiple of the data axis). The reference has no
    multi-device evaluation at all.

    canvas_buckets: optional list of (h, w) inference canvases (from
    utils.image.parse_buckets). Each batch is cropped to the smallest
    bucket covering every example in it — identical outputs (canvas
    masking; tests/test_canvas_parity.py) at up to ~25% less trunk
    work for 4:3-dominated splits. Each bucket shape compiles once.
    """
    if batch_size > 1:
        compute_losses = False
    batch_shard = None
    if mesh is not None and batch_size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_par = mesh.shape["data"]
        if batch_size % data_par:
            raise ValueError(
                f"batch_size {batch_size} must be a multiple of the "
                f"data axis {data_par}")
        params = jax.device_put(params, NamedSharding(mesh, P()))
        batch_shard = NamedSharding(mesh, P("data"))
    split_n = loader.split_size(split)
    n_images = split_n if max_images <= 0 else min(max_images, split_n)
    loader.reset_iterator(split)
    evaluator = DenseCaptioningEvaluator(id=id)
    idx_to_token = loader.idx_to_token()

    if batch_size > 1:
        fwd_batch = jax.jit(
            lambda p, ims, hs, ws: densecap.forward_test_batch(
                p, ims, hs, ws, cfg, use_beam=beam_size)
        )
    else:
        fwd_test = jax.jit(
            lambda p, im, h, w: densecap.forward_test(
                p, im, h, w, cfg, use_beam=beam_size)
        )
    if compute_losses:
        fwd_loss = jax.jit(
            lambda p, im, h, w, gb, gl, gv, r: densecap.forward_train(
                p, im, h, w, gb, gl, gv, r, cfg
            )
        )
    rng = loss_rng if loss_rng is not None else jax.random.PRNGKey(0)

    all_losses = []

    def add_one(ex, out_boxes, out_scores, out_caps, out_valid, counter):
        valid = np.asarray(out_valid)
        boxes = np.asarray(out_boxes)[valid]
        scores = np.asarray(out_scores)[valid]
        captions = decode_sequence(
            np.asarray(out_caps)[valid], idx_to_token, cfg.vocab_size
        )
        gv = np.asarray(ex["gt_valid"])
        gt_boxes = np.asarray(ex["gt_boxes"])[gv]
        gt_captions = decode_sequence(
            np.asarray(ex["gt_labels"])[gv], idx_to_token, cfg.vocab_size
        )
        evaluator.add_result(scores, boxes, captions, gt_boxes,
                             gt_captions)
        if verbose:
            print(
                f"Processed image {ex['filename']} ({counter + 1}/"
                f"{n_images}) of split {split}, detected {len(boxes)} "
                "regions"
            )

    if batch_size > 1:
        # The tail runs as its own SMALLER program instead of repeat-
        # padding to the full batch (which duplicated up to B-1 images
        # of device work on the val-every-N path): pad only up to the
        # mesh data-axis multiple. One extra compiled shape per split
        # size, cached by jit (and the persistent compile cache).
        data_par = mesh.shape["data"] if batch_shard is not None else 1
        done = 0
        while done < n_images:
            n_real = min(batch_size, n_images - done)
            prog_b = min(batch_size,
                         -(-n_real // data_par) * data_par)
            exs = [loader.get_example(split=split, iterate=True)
                   for _ in range(n_real)]
            while len(exs) < prog_b:  # pad to the data-axis multiple
                exs.append(exs[-1])
            ims = np.stack([e["image"] for e in exs])
            hs = jnp.asarray(np.asarray([e["height"] for e in exs],
                                        np.float32))
            ws = jnp.asarray(np.asarray([e["width"] for e in exs],
                                        np.float32))
            if canvas_buckets:
                from ..utils.image import pick_bucket

                bh = max(pick_bucket(e["height"], e["width"],
                                     canvas_buckets)[0] for e in exs)
                bw = max(pick_bucket(e["height"], e["width"],
                                     canvas_buckets)[1] for e in exs)
                # cover (bh, bw) with a listed bucket so shapes stay few
                bh, bw = pick_bucket(bh, bw, canvas_buckets)
                ims = ims[:, :bh, :bw]
            ims = jnp.asarray(ims)
            if batch_shard is not None:
                ims = jax.device_put(ims, batch_shard)
                hs = jax.device_put(hs, batch_shard)
                ws = jax.device_put(ws, batch_shard)
            out = fwd_batch(params, ims, hs, ws)
            for i in range(n_real):
                add_one(exs[i], out.boxes[i], out.scores[i],
                        out.captions[i], out.valid[i], done + i)
            done += n_real
    else:
        for counter in range(n_images):
            ex = loader.get_example(split=split, iterate=True)
            im = jnp.asarray(ex["image"])
            h, w = jnp.float32(ex["height"]), jnp.float32(ex["width"])

            if compute_losses:
                rng, sub = jax.random.split(rng)
                losses = fwd_loss(
                    params, im, h, w, jnp.asarray(ex["gt_boxes"]),
                    jnp.asarray(ex["gt_labels"]),
                    jnp.asarray(ex["gt_valid"]), sub,
                )
                all_losses.append({k: float(v) for k, v in losses.items()})

            out = fwd_test(params, im, h, w)
            add_one(ex, out.boxes, out.scores, out.captions, out.valid,
                    counter)

    loss_results = {
        k: float(np.mean([d[k] for d in all_losses]))
        for k in all_losses[0]
    } if all_losses else {}
    ap_results = evaluator.evaluate()
    if verbose:
        print(f"mAP: {100 * ap_results['map']:.4f} "
              f"(caption scorer: {ap_results['score_method']})")
    return {"loss_results": loss_results, "ap_results": ap_results}
