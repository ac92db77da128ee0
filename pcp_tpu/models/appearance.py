"""Per-view appearance decoupling network (VastGaussian), Flax port.

Reference: scene/ptgs/appearance_network.py:7-61. A trainable 64-d embedding
per view is concatenated onto a 1/32-downsampled render; a conv + 4x
(PixelShuffle-2 + conv3x3 + ReLU) upsampling stack + bilinear resize + two
final convs + sigmoid produce a multiplicative ``transformation map``; the
decoupled image (map * render) feeds the L1 loss while SSIM sees the raw
render (train.py:111-117).

NHWC layout (TPU-native; the reference is NCHW). Embedding table:
(2048, 64) like gaussian_model.py:52-55.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_EMBEDDINGS = 2048
EMBED_DIM = 64

# bfloat16 CNN compute (params stay f32 in the optimizer — standard mixed
# precision; output cast back to f32). ON by default since the full-res
# tail became shifted matmuls: the tail is HBM-traffic-bound (9 shifted
# reads of a 30 MB activation per conv), so halving bytes is a straight
# win — measured 42.1 -> 41.0 ms/step, train-step parity gate unchanged
# (tools/tpu_parity_check.py). Earlier "no gain" measurements (10.73 vs
# 10.76, then 54.0 vs 54.5) predate the matmul-conv rewrite, when the
# conv emitter's layout copies, not bandwidth, bounded the net. The net
# has no cancellation-sensitive math (cf. the SSIM bf16 bug): it is
# convs + relu + sigmoid on O(1) activations. PCP_APP_BF16=0 reverts.
import os as _os

APP_BF16 = _os.environ.get("PCP_APP_BF16", "1") == "1"

# Transformation-map range. The reference's map is sigmoid(x) in (0, 1)
# (appearance_network.py:59) — purely attenuating, so per-view gains > 1
# are structurally inexpressible: the radiance field must migrate to the
# scene's BRIGHTEST exposure envelope before per-view maps can darken
# from it, and until it does, brightened views push their jitter INTO the
# shared field (the round-3/4 appearance A/B mechanism; dbg_appearance
# measures the map clipping at ~0.998 on gain-1.2 views). Setting
# PCP_APP_MAP_SCALE=2 widens the map to (0, 2) so gains either side of 1
# are expressible. Default 1.0 = exact reference semantics.
APP_MAP_SCALE = float(_os.environ.get("PCP_APP_MAP_SCALE", "1"))


def _pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C), torch PixelShuffle semantics."""
    b, h, w, c = x.shape
    co = c // (r * r)
    # torch PixelShuffle: channel index = co_idx * r*r + (dy * r + dx)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r(dy), w, r(dx), co
    return x.reshape(b, h * r, w * r, co)


def _resize_matrix(out: int, inp: int) -> jnp.ndarray:
    """(out, inp) align_corners=True bilinear interpolation matrix
    (2 non-zeros per row). Dense so the resize runs as a matmul on the
    MXU instead of 4 gathers on the VPU — the gather formulation was the
    appearance net's hottest op (~half its 50 ms fwd+bwd on TPU)."""
    import numpy as np

    if out == 1 or inp == 1:
        m = np.zeros((out, inp), np.float32)
        m[:, 0] = 1.0
        return jnp.asarray(m)
    pos = np.arange(out, dtype=np.float64) * ((inp - 1) / (out - 1))
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, inp - 1)
    i1 = np.clip(i0 + 1, 0, inp - 1)
    f = (pos - i0).astype(np.float32)
    m = np.zeros((out, inp), np.float32)
    m[np.arange(out), i0] += 1.0 - f
    m[np.arange(out), i1] += f
    import jax

    with jax.ensure_compile_time_eval():
        return jnp.asarray(m)


def _bilinear_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """align_corners=True bilinear resize (torch F.interpolate parity),
    expressed as two dense matmuls: out = Wy @ x @ Wx^T per channel."""
    b, hi, wi, c = x.shape
    wy = _resize_matrix(h, hi)
    wx = _resize_matrix(w, wi)
    x = jnp.einsum("oh,bhwc->bowc", wy, x,
                   preferred_element_type=jnp.float32)
    return jnp.einsum("pw,bhwc->bhpc", wx, x,
                      preferred_element_type=jnp.float32)


class UpsampleBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = _pixel_shuffle(x, 2)
        x = nn.Conv(self.out_channels, (3, 3), padding=1)(x)
        return nn.relu(x)


def _conv3x3_mm(x, kernel, bias):
    """3x3 SAME conv as 9 shifted (B*H*W, Cin) @ (Cin, Cout) matmuls.

    Functionally identical to nn.Conv(padding=1) (HIGHEST precision, f32
    accumulate), but avoids XLA:TPU's convolution emitter, whose full-res
    NHWC lowering at C=16 inserts multi-ms layout-change copies on both
    sides (profiled: ~4.6 ms of a 54 ms train step for the two final
    convs' copies alone). The 9 shifted reads fuse into the matmuls; the
    backward becomes 9 reduce-major matmuls for dW (MXU-shaped) and 9
    shifted matmuls for dx — no conv ops anywhere."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.slice(
                xp, (0, dy, dx, 0), (b, dy + h, dx + w, cin))
            o = jnp.einsum("bhwc,cd->bhwd", xs, kernel[dy, dx],
                           precision=jax.lax.Precision.HIGHEST)
            out = o if out is None else out + o
    return out + bias


class MMConv(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), padding=1) with identical
    param names/shapes/init (checkpoint-compatible), applied via
    _conv3x3_mm."""

    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return _conv3x3_mm(x, kernel, bias)


class AppearanceNetwork(nn.Module):
    """Input (B, H/32, W/32, 3+64) -> multiplicative map (B, H, W, 3)."""

    @nn.compact
    def __call__(self, x, h: int, w: int):
        x = nn.relu(nn.Conv(256, (3, 3), padding=1)(x))
        x = UpsampleBlock(128)(x)
        x = UpsampleBlock(64)(x)
        x = UpsampleBlock(32)(x)
        x = UpsampleBlock(16)(x)
        x = _bilinear_resize(x, h, w)
        # full-res tail as matmul convs (names match the nn.Conv layout
        # the rest of the net uses, so params/checkpoints are unchanged)
        x = nn.relu(MMConv(16, name="Conv_1")(x))
        x = MMConv(3, name="Conv_2")(x)
        if APP_MAP_SCALE != 1.0:
            return APP_MAP_SCALE * nn.sigmoid(x)
        return nn.sigmoid(x)


def init_appearance(key, image_size, num_embeddings: int = NUM_EMBEDDINGS):
    """Returns {"embeddings": (E, 64), "net": flax params}."""
    w, h = int(image_size[0]), int(image_size[1])
    k1, k2 = jax.random.split(key)
    net = AppearanceNetwork()
    dummy = jnp.zeros((1, max(h // 32, 1), max(w // 32, 1), 3 + EMBED_DIM))
    variables = net.init(k2, dummy, h, w)
    emb = jax.random.normal(k1, (num_embeddings, EMBED_DIM)) * 0.01
    return {"embeddings": emb, "net": variables["params"]}


def decouple_appearance(image: jnp.ndarray, app_params, view_idx) -> jnp.ndarray:
    """(H, W, 3) render -> appearance-transformed image (and the map).

    Mirrors decouple_appearance (appearance_network.py:7-17): downsample x32,
    concat the view embedding, run the CNN, multiply into the render.
    """
    h, w = image.shape[0], image.shape[1]
    hd, wd = max(h // 32, 1), max(w // 32, 1)
    down = _bilinear_resize(image[None], hd, wd)
    emb = app_params["embeddings"][view_idx]
    emb_map = jnp.broadcast_to(emb[None, None, None, :], (1, hd, wd, EMBED_DIM))
    x = jnp.concatenate([down, emb_map], axis=-1)
    net_params = app_params["net"]
    # bf16 only where it pays: CPU (the test backend) emulates bf16 slowly
    if APP_BF16 and jax.default_backend() == "tpu":
        x = x.astype(jnp.bfloat16)
        net_params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16), net_params
        )
    mapping = AppearanceNetwork().apply({"params": net_params}, x, h, w)[0]
    mapping = mapping.astype(jnp.float32)
    return mapping * image, mapping
