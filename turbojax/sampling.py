"""Init designs and trust-region candidate generation (SURVEY.md C16).

Reference capability [R — TuRBO ``latin_hypercube`` / ``_create_candidates``]:
Latin-hypercube initial designs; Sobol candidates inside the trust region
with per-dimension perturbation masks (perturb prob ``min(20/d, 1)``, at
least one dimension per candidate).

TPU-native design (SURVEY.md §7.3.7): there is no jax-native Sobol, so the
direction numbers are pulled **once on the host** from scipy's Joe-Kuo table
(``scipy.stats.qmc.Sobol``, verified bit-exact against scipy's own stream in
``tests/test_sampling.py``) and baked into the jit as a static uint32
constant; point generation is then a pure-jnp gray-code XOR accumulation,
randomized per BO iteration with a digital shift (XOR with per-dimension
random 30-bit offsets — a standard RQMC scheme that preserves uniform
marginals and low discrepancy). Everything downstream of the table is
traceable inside ``lax.scan``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_SOBOL_BITS = 30


@functools.lru_cache(maxsize=None)
def _direction_numbers(dim: int) -> np.ndarray:
    """Host-side Joe-Kuo direction numbers, (dim, 30) uint32."""
    from scipy.stats import qmc

    return np.asarray(qmc.Sobol(d=dim, scramble=False)._sv, dtype=np.uint32)


def sobol_raw(dim: int, n: int, start_index: int = 0, dtype=jnp.float32) -> Array:
    """Unscrambled Sobol points i = start..start+n−1 in [0,1)^dim (pure jnp).

    Deliberately test-only: the product path always applies the digital
    shift (``sobol``, RQMC), and this unshifted variant exists as the
    bit-exactness witness vs ``scipy.stats.qmc.Sobol`` in
    ``test_sampling.py`` — proof the in-jit Joe-Kuo generator matches the
    reference generator exactly before randomization."""
    sv = jnp.asarray(_direction_numbers(dim))  # static constant under jit
    idx = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(start_index)
    gray = idx ^ (idx >> 1)
    acc = jnp.zeros((n, dim), jnp.uint32)
    for b in range(_SOBOL_BITS):
        take = ((gray >> b) & 1).astype(jnp.uint32)
        acc = acc ^ take[:, None] * sv[None, :, b]
    return acc.astype(dtype) / (2.0**_SOBOL_BITS)


def _parity(x: Array) -> Array:
    """Bitwise parity (popcount mod 2) of uint32 lanes, pure jnp."""
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & jnp.uint32(1)


def lms_scramble_sv(sv: Array, rows: Array) -> Array:
    """Apply a linear matrix scramble (Matousek) to Sobol direction numbers.

    ``sv``: (dim, 30) uint32 direction numbers (30-bit, MSB = most
    significant fraction bit). ``rows``: (dim, 30) uint32 GF(2) matrix rows
    in integer-bit encoding — row ``i`` (i=0 acts on the most significant
    output bit) has its forced diagonal at integer bit position ``29−i``,
    random bits only at strictly-higher positions, zeros below. Output bit
    position ``29−i`` of each scrambled direction number is
    ``parity(rows[d, i] & v)``.

    This is bit-exactly scipy's ``Sobol(scramble=True)`` ``_cscramble``
    convention (lower-triangular MSB-first matrices acting on each
    direction-number column; verified in ``tests/test_sampling.py`` by
    replaying scipy's own rng draws through this function). LMS of the
    generating matrices commutes with point generation, so scrambling the
    30 direction numbers once is equivalent to scrambling every point."""
    # (dim, 30 rows, 30 direction numbers) -> parity -> weighted sum
    par = _parity(rows[:, :, None] & sv[:, None, :])  # (dim, i, b)
    weights = (jnp.uint32(1) << (jnp.uint32(_SOBOL_BITS - 1) - jnp.arange(_SOBOL_BITS, dtype=jnp.uint32)))
    return jnp.sum(par * weights[None, :, None], axis=1, dtype=jnp.uint32)


def lms_random_rows(key: Array, dim: int) -> Array:
    """Random LMS row masks for ``lms_scramble_sv``: per dim an independent
    lower-triangular (MSB-first) random GF(2) matrix with unit diagonal."""
    rnd = jax.random.bits(key, (dim, _SOBOL_BITS), jnp.uint32)
    i = jnp.arange(_SOBOL_BITS, dtype=jnp.uint32)
    diag = jnp.uint32(1) << (jnp.uint32(_SOBOL_BITS - 1) - i)
    # strictly-above-diagonal positions: p >= 30 - i (empty for i = 0)
    high = jnp.where(
        i > 0,
        (jnp.uint32((1 << _SOBOL_BITS) - 1)
         & ~((jnp.uint32(1) << (jnp.uint32(_SOBOL_BITS) - i)) - jnp.uint32(1))),
        jnp.uint32(0),
    )
    return (rnd & high[None, :]) | diag[None, :]


def sobol_sample(
    key: Array, dim: int, n: int, dtype=jnp.float32, scramble: str = "shift"
) -> Array:
    """Randomized Sobol points, jit-traceable, fresh randomization per key.

    ``scramble``:
      - ``"shift"``: digital shift only (XOR with per-dim random 30-bit
        offsets) — preserves uniform marginals and the net's dyadic
        stratification, but NOT the scrambling-based variance reduction of
        nested/linear scrambles in high dimensions.
      - ``"lms"``: Matousek linear matrix scramble + digital shift — the
        same randomization class as ``scipy.stats.qmc.Sobol(scramble=True)``
        (the reference stack's stream, and the stream the f64 numpy oracle
        campaigns use), implemented in-jit over the same Joe-Kuo table.
        A fresh random matrix per call/key (each BO iteration draws its own
        scramble, the standard RQMC usage).
    """
    sv = jnp.asarray(_direction_numbers(dim))
    if scramble == "lms":
        k_lms, key = jax.random.split(key)
        sv = lms_scramble_sv(sv, lms_random_rows(k_lms, dim))
    elif scramble != "shift":
        raise ValueError(f"unknown scramble {scramble!r}; use 'shift' or 'lms'")
    idx = jnp.arange(n, dtype=jnp.uint32)
    gray = idx ^ (idx >> 1)
    acc = jnp.zeros((n, dim), jnp.uint32)
    for b in range(_SOBOL_BITS):
        take = ((gray >> b) & 1).astype(jnp.uint32)
        acc = acc ^ take[:, None] * sv[:, b][None, :]
    shift = jax.random.bits(key, (dim,), jnp.uint32) >> (32 - _SOBOL_BITS)
    acc = acc ^ shift[None, :]
    return acc.astype(dtype) / (2.0**_SOBOL_BITS)


def latin_hypercube(key: Array, n: int, dim: int, dtype=jnp.float32) -> Array:
    """Latin-hypercube design in [0,1)^dim: one stratified sample per row per
    dim through independent permutations (reference ``latin_hypercube`` [R])."""
    kp, ku = jax.random.split(key)
    perms = jax.vmap(lambda k: jax.random.permutation(k, n))(jax.random.split(kp, dim))  # (dim, n)
    u = jax.random.uniform(ku, (n, dim), dtype)
    return (perms.T.astype(dtype) + u) / n


def perturbation_mask(key: Array, n: int, dim: int) -> Array:
    """TuRBO per-candidate perturbation mask [R]: each dim flipped with prob
    ``min(20/d, 1)``; rows that would be all-zero get one random dim."""
    kb, kf = jax.random.split(key)
    prob = min(20.0 / dim, 1.0)
    mask = jax.random.bernoulli(kb, prob, (n, dim))
    fallback_dim = jax.random.randint(kf, (n,), 0, dim)
    fallback = jax.nn.one_hot(fallback_dim, dim, dtype=jnp.bool_)
    return jnp.where(jnp.any(mask, axis=-1, keepdims=True), mask, fallback)


def tr_candidates(
    key: Array,
    center: Array,
    length: Array,
    lengthscale: Array,
    n_cand: int,
    local_frac: float = 0.0,
    local_sigma: float = 0.3,
    scramble: str = "shift",
) -> Array:
    """TuRBO trust-region candidates in the unit cube (SURVEY.md C17 [R]).

    The box side per dim is the TR length scaled by normalized ARD
    lengthscale weights ``w = ℓ/mean(ℓ) / prod(ℓ/mean(ℓ))^(1/d)``; Sobol
    points fill the clipped box, and each candidate perturbs only a masked
    subset of dims away from the center.

    ``local_frac > 0`` replaces that fraction of the pool with Gaussian
    draws around the incumbent (σ = ``local_sigma`` × the per-dim half
    width, clipped to the TR box, same sparse perturbation masks): uniform
    Sobol spacing inside the box caps refinement precision at
    ~(1/n_cand)^(1/d_perturbed), which starves high-d problems near small
    TR lengths (rover-60, docs/ROADMAP.md item 1). 0 = pure reference
    behavior [R]."""
    dim = center.shape[-1]
    ks, km, kl = jax.random.split(key, 3)
    w = lengthscale / jnp.mean(lengthscale)
    w = w / jnp.exp(jnp.mean(jnp.log(w)))  # prod(w)^(1/d) normalization
    half = w * length / 2.0
    lb = jnp.clip(center - half, 0.0, 1.0)
    ub = jnp.clip(center + half, 0.0, 1.0)
    n_local = int(round(local_frac * n_cand))
    pert = lb + (ub - lb) * sobol_sample(
        ks, dim, n_cand - n_local, dtype=center.dtype, scramble=scramble
    )
    if n_local:
        g = center + local_sigma * half * jax.random.normal(kl, (n_local, dim), center.dtype)
        pert = jnp.concatenate([pert, jnp.clip(g, lb, ub)], axis=0)
    mask = perturbation_mask(km, n_cand, dim)
    return jnp.where(mask, pert, center[None, :])


def n_candidates(dim: int, cap: int = 5000) -> int:
    """Reference candidate-set size: min(100·d, 5000) [R, B:9]."""
    return min(100 * dim, cap)
