import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)

def bench_sort(L, N, extras=1):
    ops = [jnp.asarray(rng.integers(0, 2**32, size=(N,), dtype=np.uint32))
           for _ in range(L)]
    ops += [jnp.asarray(rng.integers(0, 2**31, size=(N,), dtype=np.int32))
            for _ in range(extras)]
    f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=L, is_stable=True)[0][:1])
    np.asarray(f(*ops))
    best = 1e9
    for _ in range(3):
        t0 = time.time(); np.asarray(f(*ops))
        best = min(best, time.time()-t0)
    print(f"lax.sort L={L} N={N} extras={extras}: {best*1e3:.1f} ms "
          f"({N/best/1e6:.1f} Mkeys/s)")

for N in (1<<20, 1<<21, 1<<22, 1<<24):
    bench_sort(2, N, 1)
bench_sort(3, 1<<21, 1)
