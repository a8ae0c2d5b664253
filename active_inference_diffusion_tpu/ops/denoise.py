"""Fused K-step reverse-diffusion sweep as a single Pallas TPU kernel.

The hot loop of the whole framework (reference: core/diffusion.py:176-206 —
a Python loop of K score-net launches; here even the XLA path is one scan).
This kernel goes further: ALL trunk weights are loaded into VMEM once and the
full K-step denoise (DiT trunk + p_sample update, including on-chip Gaussian
noise via Box-Muller over the TPU PRNG) runs inside one kernel — zero HBM
weight re-reads between steps and no per-op dispatch overhead.

Scope: the *discrete-time trunk* path used by belief generation. The
observation embedding and the K time embeddings are precomputed outside (they
are step-invariant / batch-invariant respectively; see
LatentScoreNetwork.trunk). Falls back to the XLA scan when the weights exceed
the VMEM budget (hidden_dim >= ~384) — checked by ``fused_sweep_supported``.

Numerics: LayerNorm eps 1e-6 and tanh-approx GELU match the Flax modules.
The stochastic path uses the TPU PRNG (different stream than
jax.random.normal), so it matches the XLA path in distribution, not bitwise;
the deterministic path matches to float tolerance (tested).
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.schedules import DiffusionSchedule

LN_EPS = 1e-6


def bits_to_normal(bits1: jnp.ndarray, bits2: jnp.ndarray) -> jnp.ndarray:
    """Box-Muller N(0,1) from two int32 random-bit arrays.

    TPU ``pltpu.prng_random_bits`` yields *signed* int32; a right-shift would
    keep the sign and produce negative uniforms (log -> NaN), so the low 24
    bits are masked out instead. Kept as a standalone function so the bit
    manipulation is unit-testable off-TPU (interpret mode cannot execute the
    TPU PRNG primitives)."""
    u1 = (bits1 & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24)) + 1e-12
    u2 = (bits2 & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * math.pi * u2)


# ---------------------------------------------------------------------------
# Weight extraction: flax param tree -> stacked arrays
# ---------------------------------------------------------------------------


def extract_trunk_weights(score_params: Dict, num_layers: int) -> Dict[str, jnp.ndarray]:
    """Stack per-block trunk weights along a leading layer axis."""
    blocks = [score_params[f"block_{i}"] for i in range(num_layers)]

    def stack(*path):
        def get(tree):
            node = tree
            for p in path:
                node = node[p]
            return node

        return jnp.stack([get(b) for b in blocks])

    return {
        "latent_proj_w": score_params["latent_proj"]["kernel"],
        "latent_proj_b": score_params["latent_proj"]["bias"],
        "mod1_w": stack("norm1", "adaLN_modulation", "kernel"),
        "mod1_b": stack("norm1", "adaLN_modulation", "bias"),
        "v_w": stack("attention", "v_proj", "kernel"),
        "v_b": stack("attention", "v_proj", "bias"),
        "o_w": stack("attention", "out_proj", "kernel"),
        "o_b": stack("attention", "out_proj", "bias"),
        "mod2_w": stack("norm2", "adaLN_modulation", "kernel"),
        "mod2_b": stack("norm2", "adaLN_modulation", "bias"),
        "f1_w": stack("mlp_fc1", "kernel"),
        "f1_b": stack("mlp_fc1", "bias"),
        "f2_w": stack("mlp_fc2", "kernel"),
        "f2_b": stack("mlp_fc2", "bias"),
        "modf_w": score_params["norm_final"]["adaLN_modulation"]["kernel"],
        "modf_b": score_params["norm_final"]["adaLN_modulation"]["bias"],
        "out1_w": score_params["out_fc1"]["kernel"],
        "out1_b": score_params["out_fc1"]["bias"],
        "out2_w": score_params["out_fc2"]["kernel"],
        "output_multiplier": score_params["output_multiplier"],
    }


def sweep_coefficients(
    schedule: DiffusionSchedule, num_steps: int, deterministic: bool
) -> jnp.ndarray:
    """(K, 8) per-sweep-step coefficients, index 0 = first step (t = K-1):
    [s1, s2, c1, c2, sqrt(pv), noise_mask, 0, 0]."""
    t = jnp.arange(num_steps - 1, -1, -1)
    noise_mask = jnp.where(
        (t > 0) & (not deterministic), 1.0, 0.0
    ).astype(jnp.float32)
    cols = [
        schedule.sqrt_one_minus_alphas_cumprod[t],
        schedule.sqrt_recip_alphas[t],
        schedule.posterior_mean_coef1[t],
        schedule.posterior_mean_coef2[t],
        jnp.sqrt(schedule.posterior_variance[t]),
        noise_mask,
        jnp.zeros_like(noise_mask),
        jnp.zeros_like(noise_mask),
    ]
    return jnp.stack(cols, axis=1).astype(jnp.float32)


def trunk_weight_bytes(
    hidden_dim: int, latent_dim: int, num_layers: int, bytes_per_param: int = 4
) -> int:
    h, d, l = hidden_dim, latent_dim, num_layers
    per_block = h * 2 * h + h * h + h * h + h * 2 * h + h * 4 * h + 4 * h * h
    total = l * per_block + d * h + h * 2 * h + h * (h // 2) + (h // 2) * d
    return bytes_per_param * total


def fused_sweep_supported(
    hidden_dim: int,
    latent_dim: int,
    num_layers: int,
    vmem_budget: int = 48 * 2**20,
    bytes_per_param: int = 4,
) -> bool:
    """VMEM-fit gate. ``bytes_per_param=2`` (compute_dtype=bfloat16) doubles
    the supported hidden range; on real TPUs bf16 kernel storage is
    numerically free (Mosaic lowers f32 dots to bf16 MXU passes anyway).

    The budget is weights-only: v5e cores have 128 MiB of VMEM and the
    kernel's activations are a few MiB per 256-row batch tile, so 48 MiB of
    weights leaves ample headroom (hidden 384 x 6 layers in f32, hidden 512
    in bf16). This is exactly the regime where the kernel beats the XLA scan
    — per-step HBM weight re-streaming dominates the scan there, while the
    kernel loads weights once for all K steps (measured in docs/PERF.md)."""
    return (
        trunk_weight_bytes(hidden_dim, latent_dim, num_layers, bytes_per_param)
        <= vmem_budget
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _ln(x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS)


def _denoise_kernel(
    num_steps: int,
    num_layers: int,
    hidden_dim: int,
    latent_dim: int,
    stochastic: bool,
    # scalar-prefetch refs (SMEM):
    seed_ref,  # (1,)
    coeffs_ref,  # (K, 8): [s1 s2 c1 c2 sd noise_mask mult 0]
    # VMEM inputs:
    z0_ref,  # (TB, D)
    obs_emb_ref,  # (TB, H)
    t_embs_ref,  # (K, H)
    lp_w_ref, lp_b_ref,
    mod1_w_ref, mod1_b_ref, v_w_ref, v_b_ref, o_w_ref, o_b_ref,
    mod2_w_ref, mod2_b_ref, f1_w_ref, f1_b_ref, f2_w_ref, f2_b_ref,
    modf_w_ref, modf_b_ref, out1_w_ref, out1_b_ref, out2_w_ref,
    out_ref,  # (TB, D)
):
    h_dim = hidden_dim

    if stochastic:
        # Independent noise per batch tile
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    def mm(x, w_ref, b_ref=None, idx=None):
        w = w_ref[idx] if idx is not None else w_ref[:]
        # Matmul inputs follow the stored weight dtype (bfloat16 when
        # TpuConfig.compute_dtype selects it -> full-rate MXU passes);
        # accumulation is always float32.
        y = jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)
        if b_ref is not None:
            b = b_ref[idx] if idx is not None else b_ref[:]
            y = y + b[None, :]
        return y

    def adaln(x, sc, w_ref, b_ref, idx=None):
        mod = mm(sc, w_ref, b_ref, idx)
        scale = mod[:, :h_dim]
        shift = mod[:, h_dim:]
        return _ln(x) * (1.0 + scale) + shift

    def normal_like(shape):
        # Box-Muller over TPU PRNG bits -> N(0, 1); see bits_to_normal.
        return bits_to_normal(
            pltpu.prng_random_bits(shape), pltpu.prng_random_bits(shape)
        )

    mult = coeffs_ref[0, 6]

    def step(i, z):
        cond = obs_emb_ref[:] + t_embs_ref[pl.ds(i, 1), :]
        sc = jax.nn.silu(cond)

        h = mm(z, lp_w_ref, lp_b_ref)
        for l in range(num_layers):
            x1 = adaln(h, sc, mod1_w_ref, mod1_b_ref, l)
            h = h + mm(mm(x1, v_w_ref, v_b_ref, l), o_w_ref, o_b_ref, l)
            x2 = adaln(h, sc, mod2_w_ref, mod2_b_ref, l)
            h = h + mm(jax.nn.gelu(mm(x2, f1_w_ref, f1_b_ref, l)), f2_w_ref, f2_b_ref, l)

        hf = adaln(h, sc, modf_w_ref, modf_b_ref)
        o1 = jax.nn.silu(mm(hf, out1_w_ref, out1_b_ref))
        score = jnp.clip(mm(o1, out2_w_ref), -10.0, 10.0) * mult

        s1 = coeffs_ref[i, 0]
        s2 = coeffs_ref[i, 1]
        c1 = coeffs_ref[i, 2]
        c2 = coeffs_ref[i, 3]

        pz0 = (z + s1 * score) * s2
        mean = c1 * pz0 + c2 * z
        if stochastic:
            mean = mean + coeffs_ref[i, 5] * coeffs_ref[i, 4] * normal_like(z.shape)
        return mean

    out_ref[:] = jax.lax.fori_loop(0, num_steps, step, z0_ref[:])


def fused_denoise_sweep(
    schedule: DiffusionSchedule,
    score_params: Dict,
    z0: jnp.ndarray,  # (B, D)
    obs_emb: jnp.ndarray,  # (B, H)
    t_embs: jnp.ndarray,  # (K, H)
    seed: jnp.ndarray,  # scalar int32
    num_steps: int,
    num_layers: int,
    deterministic: bool = False,
    batch_tile: int = 256,
    interpret: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Run the full K-step denoise as one Pallas kernel. Returns z_0 (B, D).

    ``compute_dtype=jnp.bfloat16`` stores the matmul kernels in bfloat16
    (halving their VMEM footprint and doubling MXU throughput); biases,
    layernorms, and the p_sample state update stay float32.
    """
    b, d = z0.shape
    h = obs_emb.shape[-1]
    w = extract_trunk_weights(score_params, num_layers)
    if compute_dtype != jnp.float32:
        w = {
            k: (v.astype(compute_dtype) if k.endswith("_w") else v)
            for k, v in w.items()
        }
    coeffs = sweep_coefficients(schedule, num_steps, deterministic)
    # stash the output multiplier in a spare coefficient column
    coeffs = coeffs.at[0, 6].set(w["output_multiplier"][0])

    tile = min(batch_tile, b)
    if b % tile != 0:
        tile = b  # fall back to a single tile for ragged batches
    grid = (b // tile,)

    def batch_spec(cols):
        return pl.BlockSpec(
            (tile, cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )

    def full_spec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _denoise_kernel, num_steps, num_layers, h, d, not deterministic
    )

    weight_order = [
        "latent_proj_w", "latent_proj_b",
        "mod1_w", "mod1_b", "v_w", "v_b", "o_w", "o_b",
        "mod2_w", "mod2_b", "f1_w", "f1_b", "f2_w", "f2_b",
        "modf_w", "modf_b", "out1_w", "out1_b", "out2_w",
    ]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), z0.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # seed, coeffs
            grid=grid,
            in_specs=[
                batch_spec(d),  # z0
                batch_spec(h),  # obs_emb
                full_spec(),  # t_embs
            ]
            + [full_spec() for _ in weight_order],
            out_specs=batch_spec(d),
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape((1,)),
        coeffs,
        z0,
        obs_emb,
        t_embs,
        *[w[k] for k in weight_order],
    )


# ---------------------------------------------------------------------------
# v2 kernel: fused linear algebra for the latency-bound regime
# ---------------------------------------------------------------------------
#
# At the flagship scale (B=256, hidden 128) the sweep is LATENCY-bound, not
# FLOP-bound (VERDICT r4 #8: ~22 ms/sweep vs a sub-ms MXU floor): the v1
# kernel issues ~40 small sequential matmuls per diffusion step. Two exact
# algebraic fusions cut that to ~22 with larger shapes:
#
# 1. The DiT "attention" runs at sequence length 1 (reference
#    models/score_networks.py:225: a single token attends to itself), so
#    softmax(qk)v == v and the block is the LINEAR chain
#    out_proj(v_proj(x)) = x @ (Wv @ Wo) + (bv @ Wo + bo). Wv@Wo is
#    precomputed on the host side of the trace — one matmul per block
#    instead of two.
# 2. All 2L+1 adaLN modulation products depend only on the conditioning
#    (obs_emb + t_emb), never on z — they are computed as ONE wide matmul
#    (B,h) @ (h, L*4h + 2h) per step and sliced, instead of 13 narrow
#    sequential matmuls interleaved with the z chain.


def extract_trunk_weights_v2(
    score_params: Dict, num_layers: int
) -> Dict[str, jnp.ndarray]:
    """v1 weights restructured for the fused-linear kernel (see above)."""
    w = extract_trunk_weights(score_params, num_layers)
    mods, bmods = [], []
    for l in range(num_layers):
        mods += [w["mod1_w"][l], w["mod2_w"][l]]
        bmods += [w["mod1_b"][l], w["mod2_b"][l]]
    mods.append(w["modf_w"])
    bmods.append(w["modf_b"])
    return {
        "latent_proj_w": w["latent_proj_w"],
        "latent_proj_b": w["latent_proj_b"],
        "mod_w": jnp.concatenate(mods, axis=1),  # (h, L*4h + 2h)
        "mod_b": jnp.concatenate(bmods, axis=0),
        "vo_w": jnp.einsum("lhk,lkj->lhj", w["v_w"], w["o_w"]),
        "vo_b": jnp.einsum("lk,lkj->lj", w["v_b"], w["o_w"]) + w["o_b"],
        "f1_w": w["f1_w"],
        "f1_b": w["f1_b"],
        "f2_w": w["f2_w"],
        "f2_b": w["f2_b"],
        "out1_w": w["out1_w"],
        "out1_b": w["out1_b"],
        "out2_w": w["out2_w"],
        "output_multiplier": w["output_multiplier"],
    }


def _denoise_kernel_v2(
    num_steps: int,
    num_layers: int,
    hidden_dim: int,
    latent_dim: int,
    stochastic: bool,
    # scalar-prefetch refs (SMEM):
    seed_ref,
    coeffs_ref,  # (K, 8): [s1 s2 c1 c2 sd noise_mask mult 0]
    # VMEM inputs:
    z0_ref,  # (TB, D)
    obs_emb_ref,  # (TB, H)
    t_embs_ref,  # (K, H)
    lp_w_ref, lp_b_ref,
    mod_w_ref, mod_b_ref, vo_w_ref, vo_b_ref,
    f1_w_ref, f1_b_ref, f2_w_ref, f2_b_ref,
    out1_w_ref, out1_b_ref, out2_w_ref,
    out_ref,  # (TB, D)
):
    h_dim = hidden_dim

    if stochastic:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    def mm(x, w_ref, b_ref=None, idx=None):
        w = w_ref[idx] if idx is not None else w_ref[:]
        y = jnp.dot(x.astype(w.dtype), w, preferred_element_type=jnp.float32)
        if b_ref is not None:
            b = b_ref[idx] if idx is not None else b_ref[:]
            y = y + b[None, :]
        return y

    def normal_like(shape):
        return bits_to_normal(
            pltpu.prng_random_bits(shape), pltpu.prng_random_bits(shape)
        )

    mult = coeffs_ref[0, 6]

    def step(i, z):
        cond = obs_emb_ref[:] + t_embs_ref[pl.ds(i, 1), :]
        sc = jax.nn.silu(cond)
        # ONE wide modulation matmul for all 2L+1 adaLN sites this step.
        mods = mm(sc, mod_w_ref, mod_b_ref)  # (TB, L*4h + 2h)

        def adaln_at(x, off):
            scale = mods[:, off : off + h_dim]
            shift = mods[:, off + h_dim : off + 2 * h_dim]
            return _ln(x) * (1.0 + scale) + shift

        h = mm(z, lp_w_ref, lp_b_ref)
        for l in range(num_layers):
            base = l * 4 * h_dim
            x1 = adaln_at(h, base)
            h = h + mm(x1, vo_w_ref, vo_b_ref, l)  # fused v_proj@out_proj
            x2 = adaln_at(h, base + 2 * h_dim)
            h = h + mm(
                jax.nn.gelu(mm(x2, f1_w_ref, f1_b_ref, l)),
                f2_w_ref, f2_b_ref, l,
            )

        hf = adaln_at(h, num_layers * 4 * h_dim)
        o1 = jax.nn.silu(mm(hf, out1_w_ref, out1_b_ref))
        score = jnp.clip(mm(o1, out2_w_ref), -10.0, 10.0) * mult

        s1 = coeffs_ref[i, 0]
        s2 = coeffs_ref[i, 1]
        c1 = coeffs_ref[i, 2]
        c2 = coeffs_ref[i, 3]

        pz0 = (z + s1 * score) * s2
        mean = c1 * pz0 + c2 * z
        if stochastic:
            mean = mean + coeffs_ref[i, 5] * coeffs_ref[i, 4] * normal_like(z.shape)
        return mean

    out_ref[:] = jax.lax.fori_loop(0, num_steps, step, z0_ref[:])


def fused_denoise_sweep_v2(
    schedule: DiffusionSchedule,
    score_params: Dict,
    z0: jnp.ndarray,  # (B, D)
    obs_emb: jnp.ndarray,  # (B, H)
    t_embs: jnp.ndarray,  # (K, H)
    seed: jnp.ndarray,
    num_steps: int,
    num_layers: int,
    deterministic: bool = False,
    batch_tile: int = 256,
    interpret: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """The fused-linear variant of :func:`fused_denoise_sweep` (same
    semantics; v_proj@out_proj and the modulation matmuls are algebraically
    combined — exact up to float re-association)."""
    b, d = z0.shape
    h = obs_emb.shape[-1]
    w = extract_trunk_weights_v2(score_params, num_layers)
    if compute_dtype != jnp.float32:
        w = {
            k: (v.astype(compute_dtype) if k.endswith("_w") else v)
            for k, v in w.items()
        }
    coeffs = sweep_coefficients(schedule, num_steps, deterministic)
    coeffs = coeffs.at[0, 6].set(w["output_multiplier"][0])

    tile = min(batch_tile, b)
    if b % tile != 0:
        tile = b
    grid = (b // tile,)

    def batch_spec(cols):
        return pl.BlockSpec(
            (tile, cols), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        )

    def full_spec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _denoise_kernel_v2, num_steps, num_layers, h, d, not deterministic
    )

    weight_order = [
        "latent_proj_w", "latent_proj_b",
        "mod_w", "mod_b", "vo_w", "vo_b",
        "f1_w", "f1_b", "f2_w", "f2_b",
        "out1_w", "out1_b", "out2_w",
    ]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), z0.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                batch_spec(d),
                batch_spec(h),
                full_spec(),
            ]
            + [full_spec() for _ in weight_order],
            out_specs=batch_spec(d),
        ),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape((1,)),
        coeffs,
        z0,
        obs_emb,
        t_embs,
        *[w[k] for k in weight_order],
    )
