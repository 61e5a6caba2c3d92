"""VGG-16 trunk and FC recognition head as functional pytrees.

Replaces the reference's loadcaffe-imported torch Sequential
(net_utils.lua:7-24, chopped at DenseCapModel.lua:61-67):

  * trunk1 = conv1_1 .. pool2   (torch layers 1-10; frozen during training)
  * trunk2 = conv3_1 .. relu5_3 (torch layers 11-30; optionally finetuned;
    note: no pool5)
  * recog  = flatten -> fc6 -> relu -> dropout -> fc7 -> relu -> dropout
    (torch layers 32-38), producing 4096-d RoI codes

Layout is NHWC with HWIO kernels (TPU-native; XLA lowers convs straight
onto the MXU). Convolutions run in a configurable compute dtype
(bfloat16 by default on TPU) with f32 params and f32 accumulation.

Checkpoint conversion note: torch flattens RoI features channel-major
(C, 7, 7) while we flatten NHWC (7, 7, C); the t7/caffemodel converter
(densecap_tpu/utils/checkpoint.py) permutes fc6's input dim accordingly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import quant

# (name, out_channels) per conv; 'M' = 2x2/2 max pool.
TRUNK1_CFG = [("conv1_1", 64), ("conv1_2", 64), "M",
              ("conv2_1", 128), ("conv2_2", 128), "M"]
TRUNK2_CFG = [("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
              ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
              ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512)]


def _conv_init(key, kh, kw, cin, cout):
    # He-normal fan-in init (the reference relies on pretrained weights;
    # for from-scratch training He init is the sane default for ReLU nets)
    std = (2.0 / (kh * kw * cin)) ** 0.5
    w = jax.random.normal(key, (kh, kw, cin, cout)) * std
    return {"w": w.astype(jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def _linear_init(key, cin, cout, std=None):
    if std is None:
        std = (2.0 / cin) ** 0.5
    w = jax.random.normal(key, (cin, cout)) * std
    return {"w": w.astype(jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32)}


def init_trunk(key, cfg, cin):
    params = {}
    for item in cfg:
        if item == "M":
            continue
        name, cout = item
        key, sub = jax.random.split(key)
        params[name] = _conv_init(sub, 3, 3, cin, cout)
        cin = cout
    return params, cin


def conv2d_same(x, p, compute_dtype):
    """3x3 'same' conv + bias, NHWC/HWIO.

    Runs in compute_dtype (MXU accumulates f32 internally) and KEEPS
    the output in compute_dtype: upcasting every activation to f32
    between convs doubled the trunk's HBM traffic (720px activations
    are 100+ MB/layer/image) for one rounding step of precision the
    bf16 conv chain doesn't have anyway. The trunk's final output is
    upcast once in apply_trunk. No preferred_element_type: its conv
    transpose rule rejects mixed f32 cotangent / bf16 operands, and
    XLA's native f32 accumulation makes it redundant here.
    """
    y = lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(compute_dtype)


def max_pool_2x2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _s2d_block_kernel(w):
    """Re-lay a (3, 3, Cin, Cout) stride-1 kernel for 2x2 space-to-depth.

    Returns (3, 3, 4*Cin, 4*Cout): a conv over the (H/2, W/2, 4*Cin)
    space-to-depth input whose depth-to-space'd output equals the
    original SAME conv EXACTLY (invalid taps carry literal zeros).

    Derivation: output pixel (2i+di, 2j+dj) reads input rows
    2i+di+u-1 for kernel tap u; in block space that is block i+delta
    with in-block offset dr where u = 2*delta + dr - di + 1. Valid taps
    have u in [0, 3); everything else is zero.
    """
    Cin, Cout = w.shape[2], w.shape[3]
    U = np.arange(3)[:, None, None]
    dr = np.arange(2)[None, :, None]
    di = np.arange(2)[None, None, :]
    u = 2 * (U - 1) + dr - di + 1          # (3, 2, 2)
    uval = (u >= 0) & (u <= 2)
    uc = np.clip(u, 0, 2)
    # index arrays over (U, V, dr, dc, di, dj)
    UU = uc[:, None, :, None, :, None]
    VV = uc[None, :, None, :, None, :]
    mask = (uval[:, None, :, None, :, None]
            & uval[None, :, None, :, None, :])
    UU, VV, mask = np.broadcast_arrays(UU, VV, mask)
    # gather: (U, V, dr, dc, di, dj, Cin, Cout)
    w6 = w[UU, VV] * jnp.asarray(mask[..., None, None], w.dtype)
    # -> (U, V, (dr, dc, Cin), (di, dj, Cout))
    w6 = jnp.transpose(w6, (0, 1, 2, 3, 6, 4, 5, 7))
    return w6.reshape(3, 3, 4 * Cin, 4 * Cout)


def conv1_1_s2d(x, p, compute_dtype):
    """conv1_1 via 2x2 space-to-depth: EXACT same outputs.

    The C=3 input of conv1_1 leaves the MXU's 128-wide contraction dim
    ~3/4 empty (measured ~3% MFU, 2.8 ms/step at B=8 — doc/BENCH.md
    trunk table). Space-to-depth re-lays the conv as (H/2, W/2, 12) x
    (3, 3, 12, 256): 4x the nominal FLOPs (the block kernel is 3/4
    zeros) but a 12-deep contraction. Measured on v5e the conv itself
    wins (1.25 vs 2.14 ms/step at B=8 720px) but the input s2d + 531 MB
    output depth-to-space shuffles cost ~4.7 ms — conv1_1 is
    bandwidth-bound, so this is OFF by default (cfg.conv1_s2d;
    scripts/conv1_variants.py has the full remedy sweep: pad-to-8
    channels and lhs-dilated fused depth-to-space also lose to plain).
    Zero weights are exact, so outputs are bit-identical up to XLA's
    data-independent summation order — canvas==cropped exactness is
    preserved because crops are block-aligned at (0, 0).

    Odd H/W are zero-padded to even and the output cropped back; the
    explicit zeros coincide with the SAME padding the plain conv reads.
    """
    N, H, W, C = x.shape
    Hp, Wp = H + (H % 2), W + (W % 2)
    if (Hp, Wp) != (H, W):
        x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    xd = x.astype(compute_dtype)
    x2 = xd.reshape(N, Hp // 2, 2, Wp // 2, 2, C)
    x2 = jnp.transpose(x2, (0, 1, 3, 2, 4, 5)).reshape(
        N, Hp // 2, Wp // 2, 4 * C)
    w2 = _s2d_block_kernel(p["w"].astype(compute_dtype))
    y2 = lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, Hp/2, Wp/2, 4*Cout)
    Cout = p["w"].shape[3]
    y = y2.reshape(N, Hp // 2, Wp // 2, 2, 2, Cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(N, Hp, Wp, Cout)
    if (Hp, Wp) != (H, W):
        y = y[:, :H, :W]
    return y + p["b"].astype(compute_dtype)


def _fused_conv_pool_stage(p, x, eh, ew, compute_dtype, interpret):
    """conv3x3+bias+ReLU+mask+2x2 pool+post-pool mask as ONE Pallas
    kernel (ops/pallas/conv_pool_kernel.py) — the pre-pool activation
    never touches HBM. Inputs are stop_gradient'd: the fused stages live
    in trunk1, which is NEVER trained (reference backward starts at
    torch layer 11, DenseCapModel.lua:338-358), and the kernel has no
    VJP — stopping gradients here keeps jax.grad tracing away from it.
    """
    from ..ops.pallas.conv_pool_kernel import fused_conv_relu_pool

    N, H, W, _ = x.shape
    if eh is None:
        ext = jnp.full((N, 2), 0.0).at[:, 0].set(float(H)).at[:, 1].set(
            float(W))
    else:
        e = jnp.stack([jnp.asarray(eh, jnp.float32),
                       jnp.asarray(ew, jnp.float32)])
        ext = jnp.broadcast_to(e[None], (N, 2))
    return fused_conv_relu_pool(
        lax.stop_gradient(x.astype(compute_dtype)),
        lax.stop_gradient(p["w"]),
        lax.stop_gradient(p["b"]),
        lax.stop_gradient(ext),
        interpret=interpret,
    )


def _extent_mask(H, W, eh, ew, dtype):
    """(H, W, 1) mask: 1 inside the valid (eh, ew) extent, 0 in padding."""
    rows = jnp.arange(H, dtype=jnp.float32) < eh
    cols = jnp.arange(W, dtype=jnp.float32) < ew
    return (rows[:, None] & cols[None, :])[..., None].astype(dtype)


def _halve_extent(e):
    """Floor-halve an extent scalar (python or traced), as torch
    SpatialMaxPooling sizes its output."""
    if hasattr(e, "dtype"):
        return jnp.floor(e / 2.0)
    return float(int(e) // 2)


def apply_trunk(params, cfg, x, compute_dtype=jnp.bfloat16,
                valid_h=None, valid_w=None, s2d_first=False,
                fuse_conv_pool=False, fuse_interpret=False):
    """Run a conv stack. x: (N, H, W, C) f32. Returns f32 activations.

    valid_h/valid_w (python or traced scalars): true image extent on a
    padded canvas. When given, activations beyond the extent are zeroed
    after EVERY conv, so each conv's SAME padding reads exactly the
    zeros a cropped-image run would read from its zero padding — the
    canvas run then equals the reference's cropped run EXACTLY (not
    approximately; asserted by the canvas==cropped tests in tests/test_densecap_model.py). The
    extent floor-halves at each pool, mirroring torch SpatialMaxPooling
    sizing. Cost: one fused elementwise multiply per conv.

    fuse_conv_pool: run conv+relu+mask+pool+mask as ONE Pallas kernel
    wherever the geometry allows (C in {64, 128}: conv1_2+pool1 and
    conv2_2+pool2 — exactly trunk1's pools). Inference/frozen-trunk
    only: the fused stage stop-gradients its inputs (trunk1 is never
    trained; DenseCapModel.lua:338-358). Pass fuse_interpret=True to
    run the kernel in interpret mode off-TPU (tests).
    """
    from ..ops.pallas.conv_pool_kernel import can_fuse

    eh, ew = valid_h, valid_w
    masked = valid_h is not None
    first_conv = True
    i = 0
    while i < len(cfg):
        item = cfg[i]
        if item == "M":
            x = max_pool_2x2(x)
            if masked:
                # floor-halve the extent AND re-mask: the pooled cell
                # just past the floored extent covers a partial window
                # of valid data (e.g. valid width 33 -> pooled col 16
                # reads original col 32) and must not leak into the
                # next conv's edge reads.
                eh, ew = _halve_extent(eh), _halve_extent(ew)
                x = x * _extent_mask(x.shape[1], x.shape[2], eh, ew,
                                     x.dtype)
            i += 1
            continue
        name, _ = item
        nxt = cfg[i + 1] if i + 1 < len(cfg) else None
        if (fuse_conv_pool and nxt == "M"
                and not (first_conv and s2d_first)
                and can_fuse(x.shape, params[name]["w"].shape)):
            # fused conv+relu+mask+pool+mask: the kernel applies both
            # the conv-extent mask and the post-pool floor-halved mask
            x = _fused_conv_pool_stage(
                params[name], x, eh, ew, compute_dtype, fuse_interpret)
            if masked:
                eh, ew = _halve_extent(eh), _halve_extent(ew)
            first_conv = False
            i += 2
            continue
        if first_conv and s2d_first:
            x = jax.nn.relu(conv1_1_s2d(x, params[name], compute_dtype))
        else:
            x = jax.nn.relu(conv2d_same(x, params[name], compute_dtype))
        first_conv = False
        if masked:
            x = x * _extent_mask(x.shape[1], x.shape[2], eh, ew,
                                 x.dtype)
        i += 1
    # one upcast at the stack boundary; inside, activations stay in
    # compute_dtype (masking zeros are exact in any dtype, so canvas ==
    # cropped equality is unaffected)
    return x.astype(jnp.float32)


def init_recog(key, in_dim=7 * 7 * 512, fc_dim=4096):
    k1, k2 = jax.random.split(key)
    return {"fc6": _linear_init(k1, in_dim, fc_dim),
            "fc7": _linear_init(k2, fc_dim, fc_dim)}


def apply_recog(params, roi_feats, *, train, dropout_key=None,
                drop_prob=0.5, compute_dtype=jnp.bfloat16):
    """RoI features (B, 7, 7, C) -> RoI codes (B, 4096), f32 out.

    Mirrors VGG fc6/fc7 with ReLU+Dropout (torch layers 32-38; dropout p
    set by -drop_prob, train_opts.lua:60). Inference scales identity
    (torch nn.Dropout is inverted dropout — scaling at train time only).
    """
    B = roi_feats.shape[0]
    x = roi_feats.reshape(B, -1).astype(compute_dtype)
    for name in ("fc6", "fc7"):
        p = params[name]
        if quant.is_quantized(p):
            # int8 W8A8 serving path (ops/quant.py): inference-only —
            # round() would zero the weight gradients under training.
            assert not train, "quantized recog params are inference-only"
            x = quant.qdot(x, p)
        else:
            x = jnp.dot(x, p["w"].astype(compute_dtype),
                        preferred_element_type=jnp.float32) + p["b"]
        x = jax.nn.relu(x)
        if train and drop_prob > 0:
            assert dropout_key is not None
            dropout_key, sub = jax.random.split(dropout_key)
            keep = jax.random.bernoulli(sub, 1.0 - drop_prob, x.shape)
            x = jnp.where(keep, x / (1.0 - drop_prob), 0.0)
        x = x.astype(compute_dtype)
    return x.astype(jnp.float32)


def feat_extent(h, w):
    """Feature-map extent for an h x w image under the 4-pool trunk.

    The floor chain matches torch SpatialMaxPooling sizing, so a padded
    canvas run + this extent equals the reference's cropped-image run.
    Works with python ints or traced scalars.
    """
    fh, fw = h, w
    for _ in range(4):
        fh = fh // 2
        fw = fw // 2
    if isinstance(fh, int):
        return fh, fw
    return (jnp.asarray(fh).astype(jnp.int32),
            jnp.asarray(fw).astype(jnp.int32))
