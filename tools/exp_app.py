"""Stage-level timing of the appearance network on the TPU."""

from __future__ import annotations

import json
import time

import numpy as np

W, H = 800, 600
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from pcp_tpu.models.appearance import (
        AppearanceNetwork,
        _bilinear_resize,
        decouple_appearance,
        init_appearance,
    )

    rng = np.random.default_rng(0)
    app = init_appearance(jax.random.PRNGKey(0), (W, H))
    img0 = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    results = {}

    def bench(name, f, x0):
        o = f(x0)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        x = x0
        for i in range(ITERS):
            o = f(x + 1e-7 * (i + 1))
        jax.block_until_ready(o)
        results[name] = round((time.perf_counter() - t0) / ITERS * 1e3, 2)

    # full decouple forward only
    @jax.jit
    def fwd(img):
        d, m = decouple_appearance(img, app, jnp.int32(0))
        return d

    bench("decouple_fwd", fwd, img0)

    # full decouple fwd+bwd
    @jax.jit
    def fb(img):
        def f(img, app_):
            d, _ = decouple_appearance(img, app_, jnp.int32(0))
            return jnp.mean(jnp.abs(d - gt))
        return jax.grad(f, argnums=(0, 1))(img, app)[0]

    bench("decouple_fwd_bwd", fb, img0)

    # downsample alone (800x600 -> 25x18)
    @jax.jit
    def down(img):
        return _bilinear_resize(img[None], max(H // 32, 1), max(W // 32, 1))

    bench("downsample_fwd", down, img0)

    # CNN trunk up to the pre-resize feature map (no full-res work)
    hd, wd = max(H // 32, 1), max(W // 32, 1)
    x_small0 = jnp.asarray(rng.uniform(0, 1, (1, hd, wd, 67)).astype(np.float32))
    net = AppearanceNetwork()

    @jax.jit
    def trunk(x):
        import flax.linen as nn

        from pcp_tpu.models.appearance import UpsampleBlock
        # mirror __call__ up to (but excluding) the bilinear + final convs
        p = app["net"]
        y = nn.relu(jax.lax.conv_general_dilated(
            x, p["Conv_0"]["kernel"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, p["Conv_0"]["kernel"].shape,
                ("NHWC", "HWIO", "NHWC")),
        ) + p["Conv_0"]["bias"])
        return y

    bench("first_conv_256", trunk, x_small0)

    # full net apply fwd
    @jax.jit
    def net_fwd(x):
        return net.apply({"params": app["net"]}, x, H, W)

    bench("net_apply_fwd", net_fwd, x_small0)

    # full net fwd+bwd
    @jax.jit
    def net_fb(x):
        def f(x, p):
            return jnp.mean(net.apply({"params": p}, x, H, W))
        return jax.grad(f, argnums=(0, 1))(x, app["net"])[0]

    bench("net_apply_fwd_bwd", net_fb, x_small0)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
