"""Low-discrepancy point machinery (lowdiscrepancy.rs).

Everything is counter-based index math — (dimension, sample_index) -> u —
which is exactly the stateless shape a TPU wants.  Base-2 uses bit reversal
(lowdiscrepancy.rs:169-184); general bases run a fixed-trip digit loop
(lowdiscrepancy.rs:230-238) with the trip count chosen per base so that
b^trips >= 2^32.
"""

import math

import numpy as np
import jax.numpy as jnp
from jax import lax


def _first_primes(n):
    sieve_limit = 10000
    while True:
        sieve = np.ones(sieve_limit, dtype=bool)
        sieve[:2] = False
        for i in range(2, int(sieve_limit**0.5) + 1):
            if sieve[i]:
                sieve[i * i :: i] = False
        primes = np.nonzero(sieve)[0]
        if len(primes) >= n:
            return primes[:n].astype(np.int64)
        sieve_limit *= 2


# PRIME_NUMS table (lowdiscrepancy.rs:8-165) — first 1024 primes, generated
# rather than transcribed.
N_PRIMES = 1024
PRIMES = _first_primes(N_PRIMES)
PRIME_SUMS = np.concatenate([[0], np.cumsum(PRIMES)])[:N_PRIMES]


def reverse_bits_32(x):
    """(lowdiscrepancy.rs:169-177); x: uint32 array."""
    u = jnp.uint32
    x = x.astype(u)
    x = (x << 16) | (x >> 16)
    x = ((x & u(0x00FF00FF)) << 8) | ((x & u(0xFF00FF00)) >> 8)
    x = ((x & u(0x0F0F0F0F)) << 4) | ((x & u(0xF0F0F0F0)) >> 4)
    x = ((x & u(0x33333333)) << 2) | ((x & u(0xCCCCCCCC)) >> 2)
    x = ((x & u(0x55555555)) << 1) | ((x & u(0xAAAAAAAA)) >> 1)
    return x


def _digit_trips(base):
    return int(math.ceil(32.0 / math.log2(base)))


def radical_inverse_base(base, a, dtype=jnp.float32):
    """Radical inverse in a *static* base; a: int array (non-negative).

    Matches radical_inverse (lowdiscrepancy.rs:230-238): digits of a in
    `base` mirrored about the radix point.
    """
    if base == 2:
        rb = reverse_bits_32(a.astype(jnp.uint32))
        # 0x1p-32 scaling; min with 1-eps like the reference.
        return jnp.minimum(
            rb.astype(jnp.float32) * jnp.float32(2.0**-32),
            jnp.float32(1.0 - 1e-7),
        ).astype(dtype)
    trips = _digit_trips(base)
    inv_base = 1.0 / base

    # JAX default integer width is 32-bit, so the mirrored value is
    # accumulated directly in floating point: v <- v*inv_base stays exact for
    # the ~24 leading digits, which saturates f32 output precision.
    def body(_, carry):
        val, acc, inv = carry
        nxt = val // base
        digit = val - nxt * base
        return nxt, acc + digit.astype(jnp.float32) * inv * inv_base, inv * inv_base

    a32 = a.astype(jnp.int32)
    _, acc, _ = lax.fori_loop(
        0,
        trips,
        body,
        (a32, jnp.zeros(a32.shape, jnp.float32), jnp.ones(a32.shape, jnp.float32)),
    )
    return jnp.minimum(acc, jnp.float32(1.0 - 1e-7)).astype(dtype)


def radical_inverse(prime_index, a, dtype=jnp.float32):
    """radical_inverse dispatching on a static prime index."""
    return radical_inverse_base(int(PRIMES[prime_index]), a, dtype)


def inverse_radical_inverse(base, inverse, n_digits):
    """(lowdiscrepancy.rs:239-249): reverse `n_digits` digits back."""
    def body(_, carry):
        inv, index = carry
        nxt = inv // base
        digit = inv - nxt * base
        return nxt, index * base + digit

    inv0 = inverse.astype(jnp.int32)
    _, index = lax.fori_loop(0, n_digits, body, (inv0, jnp.zeros_like(inv0)))
    return index


def scrambled_radical_inverse_base(base, a, perm, dtype=jnp.float32):
    """(lowdiscrepancy.rs:272+): digit-permuted radical inverse.

    perm: (base,) int array permuting digits.  Includes the reference's
    correction term perm[0] * base / (base - 1) folded into the tail — the
    standard PBRT formulation sums perm(0) over the infinite tail:
    (inv * base^trips + perm[0]/(base-1)-ish).  We replicate PBRT v3:
        (rev + perm[0] * inv_base_n / (1 - inv_base)) * inv_base_n...
    evaluated with the same finite-trip structure.

    The per-digit permutation lookup rides tableops (one-hot MXU for
    small bases) — the serialized `perm[digit]` gather cost ~8 ms per
    dim per 230K rows on the bench chip (tools/profile_halton.py), which
    made the Halton slot payload dominate the fused SPPM camera pass.
    """
    from .tableops import take_rows

    trips = _digit_trips(base)
    inv_base = 1.0 / base
    # f32 rows select exactly on the MXU; permutation values < 2^24
    perm_f = perm.astype(jnp.float32)

    def body(_, carry):
        val, acc, inv = carry
        nxt = val // base
        digit = val - nxt * base
        pd = take_rows(perm_f, digit)
        return nxt, acc + pd * inv * inv_base, inv * inv_base

    a32 = a.astype(jnp.int32)
    _, acc, inv_base_n = lax.fori_loop(
        0,
        trips,
        body,
        (a32, jnp.zeros(a32.shape, jnp.float32), jnp.ones(a32.shape, jnp.float32)),
    )
    # Infinite tail of perm[0] digits past the finite trip count
    # (PBRT v3 formulation the reference follows).
    tail = perm[0].astype(jnp.float32) * inv_base / (1.0 - inv_base)
    val = acc + inv_base_n * tail
    return jnp.minimum(val, jnp.float32(1.0 - 1e-7)).astype(dtype)


def compute_radical_inverse_permutations(seed=0):
    """Host build of per-prime digit permutations
    (lowdiscrepancy.rs:250-270).  Deterministic (seeded) unlike the
    reference's thread_rng — determinism is a feature of this build
    (SURVEY §2.6)."""
    rng = np.random.default_rng(seed)
    total = int(PRIME_SUMS[-1] + PRIMES[-1])
    perms = np.zeros(total, dtype=np.int32)
    offset = 0
    for p in PRIMES:
        perms[offset : offset + p] = rng.permutation(p)
        offset += p
    return perms
