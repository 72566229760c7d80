"""TPU timing of the Halton slot-value computation (_halton_u) that
feeds the megakernels' input-matrix sampler path, vs the same-size
stratified in-kernel math.  Finding from profile_sppm_stages: the SPPM
camera walk is 104 ms while the path kernel does the same walk shape at
~4 ms — the only structural difference is the Halton payload."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, n=5):
    def _force(x):
        x = jax.block_until_ready(x)
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if isinstance(l, jax.Array)]
        if leaves:
            np.asarray(min(leaves, key=lambda v: v.size).addressable_data(0))
        return x
    out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        _force(out)
    return (time.time() - t0) / n


def main():
    from rs_ray_toy_tpu.sampler.halton import HaltonSampler
    from rs_ray_toy_tpu.scene.loader import SamplerSpec
    from rs_ray_toy_tpu.ops.path_megakernel import _halton_u
    from rs_ray_toy_tpu.ops.sppm_megakernel import _sppm_slots

    n = 640 * 360
    sampler = HaltonSampler(
        SamplerSpec(kind="halton", nsamp=4, sample_at_center=True),
        640, 360, seed=0,
    )
    pid = jnp.arange(n, dtype=jnp.uint32)
    sid = jnp.zeros((n,), jnp.uint32)
    slots = _sppm_slots(3)
    print(f"backend={jax.default_backend()} n={n} slots={slots}")

    f = jax.jit(lambda p, s: _halton_u(sampler, p, s, slots))
    t = timed(f, pid, sid)
    print(f"_halton_u (SPPM depth-3 slots, {sum(x[1] for x in slots)} dims): {t*1e3:.1f} ms")

    # single scrambled dim in isolation
    g = jax.jit(lambda p, s: sampler.get_1d(p, s, 5))
    t1 = timed(g, pid, sid)
    print(f"one scrambled get_1d (dim 5 -> halton dim 10): {t1*1e3:.1f} ms")

    # unscrambled dims 0/1 (base 2/3, no perm gather)
    g2 = jax.jit(lambda p, s: sampler.get_2d(p, s, 0))
    t2 = timed(g2, pid, sid)
    print(f"get_2d slot 0 (dims 0/1, no perm): {t2*1e3:.1f} ms")


if __name__ == "__main__":
    main()


def isolate():
    from rs_ray_toy_tpu.sampler.halton import HaltonSampler
    from rs_ray_toy_tpu.scene.loader import SamplerSpec
    from rs_ray_toy_tpu.core import lowdiscrepancy as ld
    import jax.numpy as jnp

    n = 640 * 360
    s = HaltonSampler(SamplerSpec(kind="halton", nsamp=4, sample_at_center=True), 640, 360, seed=0)
    pid = jnp.arange(n, dtype=jnp.uint32)
    sid = jnp.zeros((n,), jnp.uint32)

    f_idx = jax.jit(lambda p, si: s._index(p, si))
    print(f"_index alone: {timed(f_idx, pid, sid)*1e3:.1f} ms")

    idx = f_idx(pid, sid)
    dims = [16, 26, 27, 28, 32, 42, 43, 44, 48]

    def sri_all(ix):
        outs = []
        for d in dims:
            base = int(ld.PRIMES[d])
            perm = s.perms[int(ld.PRIME_SUMS[d]): int(ld.PRIME_SUMS[d]) + base]
            outs.append(ld.scrambled_radical_inverse_base(base, ix, perm))
        return jnp.stack(outs, 0)

    print(f"9x scrambled (shared idx): {timed(jax.jit(sri_all), idx)*1e3:.1f} ms")

    def sri_one(ix):
        base = int(ld.PRIMES[16])
        perm = s.perms[int(ld.PRIME_SUMS[16]): int(ld.PRIME_SUMS[16]) + base]
        return ld.scrambled_radical_inverse_base(base, ix, perm)

    print(f"1x scrambled (shared idx): {timed(jax.jit(sri_one), idx)*1e3:.1f} ms")


if __name__ == "__main__":
    pass
