"""Shared CLI helpers."""

from __future__ import annotations

import os


def setup_compilation_cache():
    """Point JAX at a persistent on-disk compilation cache so process
    restarts don't re-pay cold compiles (first compiles over the dev
    tunnel run 20-400 s; beam search ~2.9 min — doc/BENCH.md). Same
    setup bench.py has always used, applied to every CLI and the
    serving stack.

    Env overrides: JAX_COMPILATION_CACHE_DIR picks the directory;
    set DENSECAP_NO_COMPILATION_CACHE=1 to disable (e.g. a read-only
    filesystem). Safe under multi-process/multi-host: entries are
    written atomically and keyed by program hash, so concurrent
    writers at worst duplicate work, never corrupt.
    """
    if os.environ.get("DENSECAP_NO_COMPILATION_CACHE", "") not in ("", "0"):
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def resolve_roi_impl(flag, cfg) -> str:
    """Resolve a --roi_align flag to a roi_align_impl config value.

    flag: "auto" | "gather" | "mxu" | "pallas" — or the legacy
    --pallas_roi_align int (-1 auto, 0 gather, 1 pallas).

    Auto picks the MXU einsum formulation on TPU at the kernel-tested
    envelope (512-channel features, 7x7 output — the standard VGG
    geometry that bench/serving run): measured fastest on v5e at
    B=8x1000 RoIs (10.2 ms vs fused-Pallas 15.7 ms vs gather,
    scripts/roi_kernel_sweep.py). Other geometries and CPU stay on the
    XLA gather path (autodiff-able, layout-unconstrained).
    """
    if flag in (0, "gather"):
        return "gather"
    if flag in (1, "pallas"):
        return "pallas"
    if flag == "mxu":
        return "mxu"
    import jax

    if (jax.devices()[0].platform == "tpu"
            and cfg.input_dim == 512
            and cfg.output_height == 7 and cfg.output_width == 7):
        return "mxu"
    return "gather"


def pallas_roi_auto(flag: int, cfg) -> bool:
    """DEPRECATED shim for the old bool flag: True only when the
    resolver picks the Pallas kernel explicitly."""
    return resolve_roi_impl(flag, cfg) == "pallas"


def maybe_quantize(params, mode: str):
    """Apply the --quantize flag to a loaded params pytree.

    "" / "none": return params unchanged (the bf16 parity path).
    "int8": W8A8-quantize the recognition fc6/fc7 and the LM vocab
    projection (ops/quant.py) — v5e's int8 MXU runs these at ~2x the
    bf16 rate. Serving-only: the train CLI never calls this.
    """
    if mode in ("", "none"):
        return params
    if mode == "int8":
        from ..ops.quant import quantize_for_inference

        return quantize_for_inference(params)
    raise SystemExit(f"--quantize: unknown mode {mode!r} "
                     "(expected none|int8)")


def add_quantize_flag(parser):
    parser.add_argument(
        "--quantize", default="", choices=["", "none", "int8"],
        help="int8: W8A8-quantize the recognition FCs (experimental; "
             "~1%% code noise, boxes/objectness branches stay full "
             "precision). MEASURED NEUTRAL at flagship geometry on "
             "v5e — the isolated FC win is cancelled by unfused "
             "quantize passes (doc/BENCH.md int8 section). Default "
             "off; useful to A/B on other geometries/hardware.")
