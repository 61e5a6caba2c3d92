"""Shared CLI helpers."""

from __future__ import annotations


def pallas_roi_auto(flag: int, cfg) -> bool:
    """Resolve a -1/0/1 --pallas_roi_align flag.

    Auto (-1) enables the fused RoI-align kernel on TPU when the model
    is at the kernel's tested envelope (512-channel features, 7x7
    output — the standard VGG geometry that bench/serving run); other
    geometries stay on the XLA gather path, which small channel counts
    can require (Mosaic layout limits).
    """
    if flag == 0:
        return False
    if flag == 1:
        return True
    import jax

    return (jax.devices()[0].platform == "tpu"
            and cfg.input_dim == 512
            and cfg.output_height == 7 and cfg.output_width == 7)
