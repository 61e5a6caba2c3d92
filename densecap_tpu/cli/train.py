"""Training CLI (reference train.lua + train_opts.lua).

Differences from the reference, by design:
  * batched + data-parallel over a device mesh (the reference is one
    image on one GPU);
  * checkpoints carry optimizer state (the reference dropped adam m/v,
    train.lua:114-115) via orbax, plus a light .npz of params for the
    inference CLIs;
  * the loss-explosion watchdog, loss history json, periodic eval and
    best-mAP snapshotting match the reference behavior
    (train.lua:133-208).
"""

from __future__ import annotations

import argparse
import json
import os
from collections import deque

import numpy as np

import jax
import jax.numpy as jnp


def build_argparser():
    p = argparse.ArgumentParser()
    # data
    p.add_argument("--data_h5", default="data/VG-regions.h5")
    p.add_argument("--data_json", default="data/VG-regions-dicts.json")
    p.add_argument("--max_gt_boxes", type=int, default=128)
    p.add_argument("--uint8_pipe", type=int, default=1,
                   help="feed raw uint8 canvases and normalize on "
                        "device (XLA fuses it into the first conv): 4x "
                        "less host work + transfer, numerically equal "
                        "to host normalization (tests/test_data_"
                        "pipeline.py). 0 = host-side f32 path")
    # model/loss (train_opts.lua defaults)
    p.add_argument("--rpn_hidden_dim", type=int, default=512)
    p.add_argument("--sampler_batch_size", type=int, default=256)
    p.add_argument("--sampler_high_thresh", type=float, default=0.7)
    p.add_argument("--sampler_low_thresh", type=float, default=0.3)
    p.add_argument("--train_remove_outbounds_boxes", type=int, default=1)
    p.add_argument("--roi_align", default="auto",
                   choices=["auto", "gather", "mxu"],
                   help="RoI-align formulation for train+eval: auto "
                        "picks the MXU einsum on TPU (f32, numerics "
                        "identical to gather, scatter-free backward; "
                        "+46%% train step), gather elsewhere")
    p.add_argument("--mid_box_reg_weight", type=float, default=0.05)
    p.add_argument("--mid_objectness_weight", type=float, default=0.1)
    p.add_argument("--end_box_reg_weight", type=float, default=0.1)
    p.add_argument("--end_objectness_weight", type=float, default=0.1)
    p.add_argument("--captioning_weight", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=1e-6)
    p.add_argument("--box_reg_decay", type=float, default=5e-5)
    p.add_argument("--rnn_size", type=int, default=512)
    p.add_argument("--input_encoding_size", type=int, default=512)
    p.add_argument("--drop_prob", type=float, default=0.5)
    # optimization
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--cosine_decay_steps", type=int, default=-1,
                   help="cosine-decay the lr over this many steps "
                        "(-1 = constant, the reference behavior)")
    p.add_argument("--optim_beta1", type=float, default=0.9)
    p.add_argument("--optim_beta2", type=float, default=0.999)
    p.add_argument("--optim_epsilon", type=float, default=1e-8)
    p.add_argument("--max_iters", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=1,
                   help="images per step (global, sharded over 'data')")
    p.add_argument("--canvas_buckets", default="",
                   help="comma list of HxW canvas buckets (e.g. "
                        "'720x576,576x720') to cut padded-square conv "
                        "waste; each bucket compiles once")
    p.add_argument("--finetune_cnn_after", type=int, default=-1)
    p.add_argument("--checkpoint_start_from", default="")
    # eval / checkpointing
    p.add_argument("--val_images_use", type=int, default=1000)
    p.add_argument("--save_checkpoint_every", type=int, default=10000)
    p.add_argument("--checkpoint_path", default="checkpoints/densecap")
    p.add_argument("--losses_log_every", type=int, default=10)
    p.add_argument("--eval_first_iteration", type=int, default=0)
    # misc
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--timing", type=int, default=0)
    p.add_argument("--profile_dir", default="",
                   help="capture an XLA profiler trace of steps 3-5 "
                        "(post-compile) into this dir, viewable in "
                        "TensorBoard/xprof")
    # multi-host (parallel/distributed.py): launch one process per host
    # with the same coordinator address and a unique process_id
    p.add_argument("--coordinator_address", default="",
                   help="host:port of process 0 (multi-host runs)")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from ._common import setup_compilation_cache
    setup_compilation_cache()

    from ..config import DenseCapConfig
    from ..data.loader import DenseCapLoader, PrefetchingLoader
    from ..eval.eval_split import eval_split
    from ..parallel import distributed as dist
    from ..parallel import mesh as meshlib
    from ..parallel import train_step as ts
    from ..utils import checkpoint as ckpt
    from ..utils.profiling import StageTimer

    dist.initialize(
        coordinator_address=args.coordinator_address or None,
        num_processes=args.num_processes if args.num_processes > 1
        else None,
        process_id=args.process_id,
    )
    nproc = jax.process_count()
    is_main = dist.is_main_process()
    if args.batch_size % nproc:
        raise SystemExit(
            f"--batch_size {args.batch_size} must divide evenly across "
            f"{nproc} processes")
    local_batch_size = args.batch_size // nproc

    # unsharded f32 view for vocab/meta/eval; raw-uint8 (default) for
    # training, with a per-process shard under multi-host
    loader = DenseCapLoader(args.data_h5, args.data_json,
                            max_gt_boxes=args.max_gt_boxes)
    raw = bool(args.uint8_pipe)
    train_loader = DenseCapLoader(
        args.data_h5, args.data_json, max_gt_boxes=args.max_gt_boxes,
        raw_images=raw)
    train_loader_sharded = train_loader if nproc == 1 else \
        DenseCapLoader(args.data_h5, args.data_json,
                       max_gt_boxes=args.max_gt_boxes, raw_images=raw,
                       shard=(jax.process_index(), nproc))
    cfg = DenseCapConfig(
        vocab_size=loader.vocab_size(),
        seq_length=loader.seq_length(),
        image_size=loader.canvas,
        rpn_num_filters=256,
        sampler_batch_size=args.sampler_batch_size,
        sampler_high_thresh=args.sampler_high_thresh,
        sampler_low_thresh=args.sampler_low_thresh,
        train_remove_outbounds_boxes=bool(args.train_remove_outbounds_boxes),
        mid_box_reg_weight=args.mid_box_reg_weight,
        mid_objectness_weight=args.mid_objectness_weight,
        end_box_reg_weight=args.end_box_reg_weight,
        end_objectness_weight=args.end_objectness_weight,
        captioning_weight=args.captioning_weight,
        weight_decay=args.weight_decay,
        box_reg_decay=args.box_reg_decay,
        rnn_size=args.rnn_size,
        rnn_encoding_size=args.input_encoding_size,
        drop_prob=args.drop_prob,
        max_gt_boxes=args.max_gt_boxes,
    )
    # MXU-einsum RoI align: same tent weights in f32 (training numerics
    # identical to the gather path, tests/test_roi_align.py grad-parity)
    # but the backward is two einsums instead of a scatter-add —
    # measured 125.6 -> 86.3 ms/step (+46%) on the flagship frozen-trunk
    # train step, one v5e chip (doc/BENCH.md).
    from ._common import resolve_roi_impl

    cfg = cfg.replace(roi_align_impl=resolve_roi_impl(args.roi_align,
                                                      cfg))
    print(f"vocab_size={cfg.vocab_size} seq_length={cfg.seq_length} "
          f"roi_align={cfg.roi_align_impl}")

    # data axis must evenly divide the global batch. Single-host: pick
    # the largest batch divisor that fits the devices (a partial mesh is
    # fine). Multi-host: the mesh MUST span every process's devices —
    # per-process feeding (jax.make_array_from_process_local_data)
    # requires each process to own an equal slice of the 'data' axis, so
    # a shrunk or host-lopsided mesh would strand hosts without shards.
    avail = len(jax.devices()) // args.model_parallel
    if nproc > 1:
        data_par = avail
        if data_par < 1 or len(jax.devices()) % args.model_parallel:
            raise SystemExit(
                f"model_parallel {args.model_parallel} does not divide "
                f"{len(jax.devices())} devices")
        if data_par % nproc:
            raise SystemExit(
                f"data axis {data_par} must divide evenly across "
                f"{nproc} processes")
        if args.batch_size % data_par:
            raise SystemExit(
                f"multi-host runs use ALL devices: --batch_size "
                f"{args.batch_size} must be a multiple of the data "
                f"axis {data_par}")
    else:
        data_par = max(
            d for d in range(1, avail + 1) if args.batch_size % d == 0
        )
    mesh = meshlib.make_mesh(
        n_devices=data_par * args.model_parallel,
        model_parallel=args.model_parallel,
    )
    print(f"mesh: data={data_par} model={args.model_parallel}")
    key = jax.random.PRNGKey(args.seed)
    lr = args.learning_rate
    if args.cosine_decay_steps > 0:
        import optax

        lr = optax.cosine_decay_schedule(
            args.learning_rate, args.cosine_decay_steps, alpha=0.02
        )
    # mesh-aware init: params are TP-padded + sharded BEFORE the adam
    # state is created so m/v match (vocab padding, mesh.pad_params_for_tp).
    state, tx = ts.init_state(
        key, cfg, learning_rate=lr, mesh=mesh,
        beta1=args.optim_beta1, beta2=args.optim_beta2,
        eps=args.optim_epsilon,
    )
    if args.checkpoint_start_from:
        # Checkpoints are saved with the TP vocab padding STRIPPED, so
        # any --model_parallel can resume any checkpoint (the helper
        # re-pads for this run's mesh).
        state = ts.resume_train_state(
            args.checkpoint_start_from, state, cfg, mesh)
        print(f"resumed from {args.checkpoint_start_from} "
              f"at step {int(state.step)}")

    # While CNN finetuning is off, delete the trunk backward from the
    # compiled program entirely (cfg.static_freeze_cnn) — the reference
    # with finetuning off backprops only from the localization layer up
    # (DenseCapModel.lua:338-358). Flipping the flag at the finetune
    # switch point recompiles exactly once.
    if not bool(state.finetune_cnn):
        cfg = cfg.replace(static_freeze_cnn=True)
        # rebuild with the conv2 zone's no-op transform (same opt_state
        # pytree — make_optimizer shares adam's init — so the state
        # built/resumed above is untouched); drops the zone's pointless
        # m/v adam traffic from the frozen-phase program
        tx = ts.make_optimizer(
            cfg, learning_rate=lr, beta1=args.optim_beta1,
            beta2=args.optim_beta2, eps=args.optim_epsilon)

    if args.canvas_buckets:
        from ..data.loader import BucketedLoader

        buckets = [
            tuple(int(v) for v in b.split("x"))
            for b in args.canvas_buckets.split(",") if b
        ]
        if nproc > 1:
            # Multi-host bucketing: every process runs the IDENTICAL
            # deterministic bucket schedule over the UNSHARDED split —
            # the schedule is a pure function of heights/widths, which
            # live in RAM on every host — then materializes only its
            # own contiguous slice of each global batch. All hosts
            # agree on every step's bucket shape with zero
            # communication (data/loader.py:BucketedLoader).
            bucketed = BucketedLoader(
                train_loader, buckets, args.batch_size, split=0,
                shard=(jax.process_index(), nproc))
        else:
            bucketed = BucketedLoader(train_loader, buckets,
                                      local_batch_size, split=0)
        # bucketing composes with prefetch now (round-1 had them
        # exclusive); the prefetch thread pulls (bucket, batch) tuples
        # and forwards the batch
        prefetch = PrefetchingLoader(
            source=lambda: bucketed.next_batch()[1])
    else:
        prefetch = PrefetchingLoader(train_loader_sharded,
                                     local_batch_size, split=0)
    meta = json.dumps({
        "vocab_size": cfg.vocab_size,
        "seq_length": cfg.seq_length,
        "idx_to_token": loader.info["idx_to_token"],
        # embedded config is for inference consumers; the static
        # backward-freeze knob is a train-time program choice
        "config": cfg.replace(static_freeze_cnn=False).to_json(),
    })

    loss_history = {}
    results_history = {}
    best_val_score = -1.0
    loss0 = None
    timer = StageTimer(enabled=bool(args.timing))
    rng = jax.random.PRNGKey(args.seed + 1)

    it = int(state.step)
    tracing = False

    def next_global_batch():
        batch_np = prefetch.next()
        batch = {
            k: v
            for k, v in batch_np.items()
            if k in ("image", "height", "width", "gt_boxes",
                     "gt_labels", "gt_valid", "weight")
        }
        # per-process local slice -> global sharded arrays (one code
        # path for single- and multi-host; parallel/distributed.py)
        return dist.global_batch_from_local(batch, mesh)

    # Deferred loss fetch: train_step results are appended here and
    # read a few steps late, so the per-step scalar fetch (a full
    # host<->device round trip) overlaps later steps instead of
    # stalling the device after every one. The NaN/explosion watchdog
    # (train.lua:203-208) therefore fires up to FETCH_LAG steps after
    # the offending step — same abort, marginally later. drain(True)
    # runs before every eval/checkpoint and at loop exit, so
    # loss_history and the watchdog observe every step exactly once.
    FETCH_LAG = 3
    pending_losses = deque()

    def drain(force=False):
        nonlocal loss0
        while pending_losses and (force or len(pending_losses) > FETCH_LAG):
            it_o, ls = pending_losses.popleft()
            # ONE scalar fetch per step: the watchdog only needs
            # total_loss. Fetching every entry of the loss dict here
            # cost ~10 synchronous link round-trips (~270 ms/step over
            # the dev tunnel — measured 3x slower steps); the full dict
            # is only materialized on log steps.
            total = float(ls["total_loss"])
            if it_o % args.losses_log_every == 0:
                vals = {k: float(v) for k, v in ls.items()}
                loss_history[it_o] = vals
                if is_main:
                    print(f"iter {it_o}: {json.dumps(vals)}")
                if args.timing:
                    print(timer.report())
            # loss explosion watchdog (train.lua:203-208) + NaN guard
            if loss0 is None:
                loss0 = total
            if total != total:
                raise SystemExit(f"loss is NaN at iter {it_o}; aborting")
            if total > 100 * loss0:
                raise SystemExit(
                    f"loss exploded ({total} > 100 x {loss0}); aborting"
                )

    with timer.stage("data"):
        next_batch = next_global_batch()
    # host-side mirror of state.finetune_cnn: reading the device scalar
    # with bool() inside the loop would force a full device sync every
    # step once `it` passes the flip point
    finetuning = bool(state.finetune_cnn)
    while args.max_iters < 0 or it < args.max_iters:
        batch = next_batch
        if (args.finetune_cnn_after >= 0
                and it >= args.finetune_cnn_after
                and not finetuning):
            finetuning = True
            state = state._replace(finetune_cnn=jnp.ones((), bool))
            cfg = cfg.replace(static_freeze_cnn=False)
            # swap the conv2 zone's no-op transform back to live adam;
            # the opt_state pytree is shared between the two (see
            # make_optimizer), so the existing state carries over and
            # conv2's adam starts from m = v = 0 exactly like the
            # reference's lazily-created cnn optim state
            # (train.lua:114-130)
            tx = ts.make_optimizer(
                cfg, learning_rate=lr, beta1=args.optim_beta1,
                beta2=args.optim_beta2, eps=args.optim_epsilon)
            print("enabling CNN finetuning (one-time recompile with the "
                  "trunk back in the backward graph)")

        # XLA trace window: steps 3-5 (past both compiles and warmup)
        if args.profile_dir and it == 2:
            jax.profiler.start_trace(args.profile_dir)
            tracing = True

        rng, sub = jax.random.split(rng)
        with timer.stage("step"):
            state, losses = ts.train_step(state, batch, sub, cfg, tx)
            if args.timing:
                jax.block_until_ready(losses["total_loss"])
        # host-side step counter (train_step increments state.step by
        # exactly 1); reading int(state.step) here would stall the
        # pipeline on every step's completion
        it += 1

        # issue the NEXT batch's host->device transfer while this step
        # computes (the transfer rides under the in-flight execution)
        with timer.stage("data"):
            next_batch = next_global_batch()

        if args.profile_dir and tracing and it >= 5:
            jax.block_until_ready(losses["total_loss"])
            jax.profiler.stop_trace()
            tracing = False
            print(f"wrote XLA trace for steps 3-5 to {args.profile_dir}")

        pending_losses.append((it, losses))
        drain()

        do_eval = (
            it % args.save_checkpoint_every == 0
            or (args.eval_first_iteration and it == 1)
            or (0 < args.max_iters == it)
        )
        if do_eval:
            # flush deferred loss fetches first so loss_history (written
            # to the checkpoint json below) and the watchdog are current
            drain(force=True)
            # multi-host: allgather the sharded state to every host (a
            # collective — ALL processes participate), then only process
            # 0 evaluates and writes
            if nproc > 1:
                from jax.experimental import multihost_utils

                def _to_host(x):
                    if isinstance(x, jax.Array) and \
                            not x.is_fully_addressable:
                        return np.asarray(
                            multihost_utils.process_allgather(
                                x, tiled=True))
                    return np.asarray(x)

                host_state = jax.tree_util.tree_map(_to_host, state)
            else:
                host_state = state
            if is_main:
                results = eval_split(
                    host_state.params, loader, cfg, split=1,
                    max_images=args.val_images_use, verbose=False,
                )
                map_score = results["ap_results"]["map"]
                results_history[it] = {
                    "loss_results": results["loss_results"],
                    "map": map_score,
                }
                print(f"iter {it}: val mAP {100 * map_score:.4f}")

                os.makedirs(os.path.dirname(args.checkpoint_path) or ".",
                            exist_ok=True)
                with open(args.checkpoint_path + ".json", "w") as f:
                    json.dump({
                        "opt": vars(args),
                        "iter": it,
                        "loss_history": loss_history,
                        "results_history": results_history,
                    }, f)

                if map_score > best_val_score:
                    best_val_score = map_score
                    # checkpoints are saved UNPADDED (TP vocab padding
                    # stripped from params and adam m/v) so a resume
                    # may pick any --model_parallel — the load path
                    # re-pads for its own mesh (parallel/mesh.py:
                    # repad_vocab)
                    save_state = meshlib.repad_vocab(
                        host_state, cfg.vocab_size + 1)
                    ckpt.save_params(
                        args.checkpoint_path + ".npz", save_state.params,
                        extra={"meta": meta},
                    )
                    ckpt.save_train_state(
                        os.path.dirname(args.checkpoint_path) or ".",
                        save_state,
                    )
                    print(f"saved checkpoint to "
                          f"{args.checkpoint_path}.npz")

    drain(force=True)  # flush deferred loss fetches past the last step
    if tracing:  # max_iters ended inside the trace window
        jax.profiler.stop_trace()
    prefetch.close()


if __name__ == "__main__":
    main()
