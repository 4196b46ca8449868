"""Weight fillers: Caffe FillerParameter semantics on JAX PRNG keys.

Rebuilds include/caffe/filler.hpp (ConstantFiller, UniformFiller,
GaussianFiller, XavierFiller, MSRAFiller, PositiveUnitballFiller,
BilinearFiller) and the FillerParameter message
(src/caffe/proto/caffe.proto:43-62): ``type`` defaults to 'constant',
``variance_norm`` (FAN_IN/FAN_OUT/AVERAGE) scales xavier/msra.

Fan computation matches filler.hpp: for a Caffe OIHW blob,
fan_in = count/num = I*kh*kw and fan_out = count/channels = O*kh*kw.  Our
conv weights are HWIO, so fan_in = prod(shape[:-1 except O])… computed from
the explicit (kh, kw, cin, cout) factorization passed by the caller.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fill(key, spec: dict | None, shape, fan_in: int | None = None,
         fan_out: int | None = None, dtype=jnp.float32):
    """Create one parameter array from a FillerParameter-shaped dict.

    ``spec`` is the parsed prototxt message (e.g. ``{'type': 'xavier'}``);
    None or missing 'type' means Caffe's default constant-0 filler.
    ``fan_in``/``fan_out`` default to the trailing/leading factorization
    used by dense layers: fan_in = prod(shape[:-1]), fan_out = shape[-1]
    scaled by the receptive field when the caller passes conv shapes.
    """
    spec = spec or {}
    ftype = str(spec.get("type", "constant"))
    n = int(math.prod(shape)) if shape else 1
    if fan_in is None:
        fan_in = n // shape[-1] if len(shape) >= 2 else n
    if fan_out is None:
        fan_out = shape[-1] if len(shape) >= 2 else n

    if ftype == "constant":
        return jnp.full(shape, float(spec.get("value", 0.0)), dtype)
    if ftype == "uniform":
        lo = float(spec.get("min", 0.0))
        hi = float(spec.get("max", 1.0))
        return jax.random.uniform(key, shape, dtype, lo, hi)
    if ftype == "gaussian":
        mean = float(spec.get("mean", 0.0))
        std = float(spec.get("std", 1.0))
        return mean + std * jax.random.normal(key, shape, dtype)
    if ftype in ("xavier", "msra"):
        vn = str(spec.get("variance_norm", "FAN_IN"))
        if vn == "FAN_OUT":
            fan = float(fan_out)
        elif vn == "AVERAGE":
            fan = (fan_in + fan_out) / 2.0
        else:
            fan = float(fan_in)
        if ftype == "xavier":
            scale = math.sqrt(3.0 / fan)
            return jax.random.uniform(key, shape, dtype, -scale, scale)
        std = math.sqrt(2.0 / fan)
        return std * jax.random.normal(key, shape, dtype)
    if ftype == "positive_unitball":
        # uniform then L1-normalize per output unit (filler.hpp): each
        # fan_in-sized row sums to 1.
        x = jax.random.uniform(key, shape, dtype)
        flat = x.reshape(-1, shape[-1]) if len(shape) >= 2 else x[None]
        flat = flat / jnp.sum(flat, axis=0, keepdims=True)
        return flat.reshape(shape)
    if ftype == "bilinear":
        # upsampling kernel for Deconvolution (filler.hpp BilinearFiller);
        # shape here is HWIO with square spatial dims.
        kh = shape[0]
        f = math.ceil(kh / 2.0)
        c = (2 * f - 1 - f % 2) / (2.0 * f)
        r = jnp.arange(kh, dtype=dtype)
        w1 = 1.0 - jnp.abs(r / f - c)
        k2 = w1[:, None] * w1[None, :]
        return jnp.broadcast_to(k2[:, :, None, None], shape).astype(dtype)
    raise ValueError(f"unknown filler type {ftype!r}")
