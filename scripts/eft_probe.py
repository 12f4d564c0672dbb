"""Are fp64 add/mul on this TPU correctly rounded (IEEE round-to-nearest)?

The double-double machinery (cgx/ops/dd.py) is built on Dekker/Knuth
error-free transforms, whose proofs require correctly rounded binary64
+ and *. TPU fp64 is emulated; if the emulation is not correctly
rounded, two_sum/two_prod error terms are garbage at the eps^2 scale
and dd degrades to plain fp64 — which would explain the round-3 probe
stalling at 3.4e-10 ~ eps64*kappa (results/hw_queue_r3/fp64q_g2000_dd).

Referee: numpy on x86 (IEEE-compliant binary64) + float128 for exact
sum/product checks of the reconstructed pairs.
"""
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

rng = np.random.default_rng(0)
N = 4096
# wide dynamic range so ties/rounding boundaries get exercised
a = rng.standard_normal(N) * np.exp2(rng.integers(-30, 30, N).astype(np.float64))
b = rng.standard_normal(N) * np.exp2(rng.integers(-30, 30, N).astype(np.float64))
aj = jnp.asarray(a)
bj = jnp.asarray(b)

dev = jax.devices()[0]
print("device:", dev, "platform:", dev.platform, file=sys.stderr, flush=True)


@jax.jit
def dev_add(a, b):
    return a + b


@jax.jit
def dev_mul(a, b):
    return a * b


@jax.jit
def dev_two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


@jax.jit
def dev_two_prod(a, b):
    SP = 134217729.0
    p = a * b
    ta = SP * a
    a_hi = ta - (ta - a)
    a_lo = a - a_hi
    tb = SP * b
    b_hi = tb - (tb - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


out = {}

# 1. bitwise agreement of device add/mul with host IEEE results
s_dev = np.asarray(dev_add(aj, bj))
p_dev = np.asarray(dev_mul(aj, bj))
s_host = a + b
p_host = a * b
out["add_bitexact_frac"] = float(np.mean(s_dev.view(np.int64) == s_host.view(np.int64)))
out["mul_bitexact_frac"] = float(np.mean(p_dev.view(np.int64) == p_host.view(np.int64)))
out["add_max_ulp_rel"] = float(np.max(np.abs(s_dev - s_host) / np.maximum(np.abs(s_host), 1e-300)) / np.finfo(np.float64).eps)
out["mul_max_ulp_rel"] = float(np.max(np.abs(p_dev - p_host) / np.maximum(np.abs(p_host), 1e-300)) / np.finfo(np.float64).eps)

# 2. EFT exactness on device: s + e must equal a + b EXACTLY
s_d, e_d = (np.asarray(v) for v in dev_two_sum(aj, bj))
exact = np.array(a, np.longdouble) + np.array(b, np.longdouble)
recon = np.array(s_d, np.longdouble) + np.array(e_d, np.longdouble)
out["two_sum_exact_frac"] = float(np.mean(recon == exact))
out["two_sum_max_err_rel_eps2"] = float(
    np.max(np.abs(np.float64(recon - exact)) / np.maximum(np.abs(s_host), 1e-300))
    / np.finfo(np.float64).eps ** 2
)

p_d, pe_d = (np.asarray(v) for v in dev_two_prod(aj, bj))
exactp = np.array(a, np.longdouble) * np.array(b, np.longdouble)
reconp = np.array(p_d, np.longdouble) + np.array(pe_d, np.longdouble)
out["two_prod_exact_frac"] = float(np.mean(reconp == exactp))
out["two_prod_max_err_rel_eps2"] = float(
    np.max(np.abs(np.float64(reconp - exactp)) / np.maximum(np.abs(p_host), 1e-300))
    / np.finfo(np.float64).eps ** 2
)

# 3. same EFTs on host numpy as a control (should be exact)
s_h, bb = a + b, (a + b) - a
e_h = (a - ((a + b) - bb)) + (b - bb)
out["host_two_sum_exact_frac"] = float(
    np.mean(np.array(s_h, np.longdouble) + np.array(e_h, np.longdouble) == exact)
)

print(json.dumps(out, indent=1))


# ---- the same questions for NATIVE float32 (VPU hardware) ----
# (exactness referee: fp64 host — exact for f32 sums/products)


rng = np.random.default_rng(1)
N = 8192
a = (rng.standard_normal(N) * np.exp2(rng.integers(-20, 20, N).astype(np.float64))).astype(np.float32)
b = (rng.standard_normal(N) * np.exp2(rng.integers(-20, 20, N).astype(np.float64))).astype(np.float32)
aj, bj = jnp.asarray(a), jnp.asarray(b)
print("device:", jax.devices()[0], file=sys.stderr, flush=True)

@jax.jit
def dev_ops(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    SP = jnp.float32(4097.0)  # 2**12 + 1 (f32 Dekker splitter)
    p = a * b
    ta = SP * a
    a_hi = ta - (ta - a); a_lo = a - a_hi
    tb = SP * b
    b_hi = tb - (tb - b); b_lo = b - b_hi
    pe = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return s, e, p, pe, a - b, a / jnp.maximum(jnp.abs(b), 1e-3)

s, e, p, pe, d, q = (np.asarray(v) for v in dev_ops(aj, bj))
a64, b64 = a.astype(np.float64), b.astype(np.float64)
out = {
  "add_bitexact_frac": float(np.mean(s.view(np.int32) == (a + b).view(np.int32))),
  "sub_bitexact_frac": float(np.mean(d.view(np.int32) == (a - b).view(np.int32))),
  "mul_bitexact_frac": float(np.mean(p.view(np.int32) == (a * b).view(np.int32))),
  # EFT exactness: fp64 host is an exact referee for f32 sums/products
  "two_sum_exact_frac": float(np.mean(s.astype(np.float64) + e.astype(np.float64) == a64 + b64)),
  "two_prod_exact_frac": float(np.mean(p.astype(np.float64) + pe.astype(np.float64) == a64 * b64)),
}
print(json.dumps({"float32_native": out}, indent=1))
