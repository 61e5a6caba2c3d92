from . import boxes, losses, nms, roi_align, sampler, transforms  # noqa: F401
