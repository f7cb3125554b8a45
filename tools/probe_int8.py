"""Feasibility probe: is int8 conv/matmul faster than bf16 on this chip,
and does an int8-stored + dequant-to-bf16 conv beat a bf16-stored conv
(HBM-bound shapes)?  One JSON line per case.

Decides whether a quantized serving path can beat the bf16 eval forward.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/probe_int8.py > /tmp/probe_int8.log 2>&1 &
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.profiling import slope_time


def report(name, secs, note=""):
    print(json.dumps({"case": name, "ms": round(secs * 1e3, 3), "note": note}),
          flush=True)


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_i32(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    # Representative eval-forward conv shapes (batch 4, 1024 canvas):
    #   layer1 3x3:   [4,256,256,64]  w [3,3,64,64]
    #   layer1 1x1:   [4,256,256,256] w [1,1,256,64]   (reduce)
    #   layer3 3x3:   [4,64,64,256]   w [3,3,256,256]
    #   FPN P2 3x3:   [4,256,256,256] w [3,3,256,256]
    shapes = [
        ("l1_3x3", (4, 256, 256, 64), (3, 3, 64, 64)),
        ("l1_1x1r", (4, 256, 256, 256), (1, 1, 256, 64)),
        ("l3_3x3", (4, 64, 64, 256), (3, 3, 256, 256)),
        ("fpn_p2", (4, 256, 256, 256), (3, 3, 256, 256)),
    ]

    for name, xs, ws in shapes:
        xf = jnp.asarray(rng.normal(0, 1, xs).astype(np.float32))
        wf = jnp.asarray(rng.normal(0, 0.05, ws).astype(np.float32))
        xb = jax.device_put(xf.astype(jnp.bfloat16), dev)
        wb = jax.device_put(wf.astype(jnp.bfloat16), dev)
        xi = jax.device_put((xf * 10).astype(jnp.int8), dev)
        wi = jax.device_put((wf * 100).astype(jnp.int8), dev)

        f_bf16 = jax.jit(conv)
        try:
            report(f"{name}_bf16", slope_time(lambda i: f_bf16(xb, wb)))
        except Exception as e:  # pragma: no cover
            report(f"{name}_bf16", -1, note=repr(e)[:200])

        # s8 x s8 -> s32 native conv
        f_int8 = jax.jit(conv_i32)
        try:
            report(f"{name}_s8s8_s32", slope_time(lambda i: f_int8(xi, wi)))
        except Exception as e:
            report(f"{name}_s8s8_s32", -1, note=repr(e)[:200])

        # int8-stored activations, dequant into bf16 conv (HBM-bytes probe)
        def deq_conv(xq, w, scale):
            return conv(xq.astype(jnp.bfloat16) * scale, w)
        f_deq = jax.jit(deq_conv)
        try:
            report(f"{name}_deq_bf16",
                   slope_time(lambda i: f_deq(xi, wb, jnp.bfloat16(0.1))))
        except Exception as e:
            report(f"{name}_deq_bf16", -1, note=repr(e)[:200])

    # Dense matmul comparison (MXU rate check): 4096^3
    a = jax.device_put(jnp.asarray(
        rng.normal(0, 1, (4096, 4096)).astype(np.float32)), dev)
    ab, bb = a.astype(jnp.bfloat16), a.T.astype(jnp.bfloat16)
    ai = (a * 10).astype(jnp.int8)
    bi = (a.T * 10).astype(jnp.int8)
    mm_b = jax.jit(lambda x, y: x @ y)
    mm_i = jax.jit(lambda x, y: jax.lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    report("mm4096_bf16", slope_time(lambda i: mm_b(ab, bb)))
    try:
        report("mm4096_s8s8_s32", slope_time(lambda i: mm_i(ai, bi)))
    except Exception as e:
        report("mm4096_s8s8_s32", -1, note=repr(e)[:200])


if __name__ == "__main__":
    main()
