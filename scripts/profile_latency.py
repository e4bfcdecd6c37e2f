import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

x = jnp.ones((8,), jnp.int32)
f = jax.jit(lambda x: x + 1)
np.asarray(f(x))
for _ in range(3):
    t0 = time.time(); np.asarray(f(x)); print(f"tiny jit round trip: {(time.time()-t0)*1e3:.1f} ms")

# chained: 10 dependent tiny dispatches then one sync
g = jax.jit(lambda x: x * 2 + 1)
def chain(x):
    for _ in range(10):
        x = g(x)
    return x
np.asarray(chain(x))
for _ in range(3):
    t0 = time.time(); np.asarray(chain(x)); print(f"10-chain + sync: {(time.time()-t0)*1e3:.1f} ms")

# big sort WITHOUT sync cost: enqueue sort then tiny dependent reduce, sync that
rng = np.random.default_rng(0)
ops = [jnp.asarray(rng.integers(0, 2**32, size=(1<<21,), dtype=np.uint32)) for _ in range(2)]
s = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=True)[0][:1])
np.asarray(s(*ops))
for _ in range(3):
    t0 = time.time(); np.asarray(s(*ops)); print(f"sort2M+sync: {(time.time()-t0)*1e3:.1f} ms")
