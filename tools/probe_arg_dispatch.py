"""One-off: does per-dispatch overhead on the tunneled PJRT backend scale
with the number of argument buffers?

probe_infer_dispatch.py showed b1 eval wall 84 ms vs ~25 ms device time,
with deep pipelining NOT closing the gap — so the serialized cost is in
dispatch itself. The eval forward passes ~700 separate param buffers;
this measures jitted-call wall time vs argument count for tiny buffers,
and for one big buffer split N ways, to locate the cost.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), (list, tuple)) else None
    r = fn(*args)
    (r[0] if isinstance(r, (list, tuple)) else r).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    (r[0] if isinstance(r, (list, tuple)) else r).block_until_ready()
    return (time.time() - t0) / iters * 1e3


def main():
    import jax, jax.numpy as jnp
    from cpm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    for n in (1, 32, 128, 512, 1024):
        xs = [jax.device_put(jnp.full((8,), i, jnp.float32)) for i in range(n)]
        f = jax.jit(lambda *a: a[0] + len(a))
        ms = timeit(f, *xs)
        print(f"{n:5d} tiny args: {ms:7.2f} ms/call", flush=True)

    # one large resident buffer (~100 MB) as a single arg
    big = jax.device_put(jnp.zeros((25_000_000,), jnp.float32))
    g = jax.jit(lambda b, x: x + b[0])
    x = jax.device_put(jnp.zeros((8,), jnp.float32))
    print(f"1 big arg (100MB):  {timeit(g, big, x):7.2f} ms/call", flush=True)

    # the big buffer split into 700 chunks, passed as 700 args
    chunks = [jax.device_put(jnp.zeros((35_000,), jnp.float32)) for _ in range(700)]
    h = jax.jit(lambda *a: a[0][:8] + len(a))
    print(f"700 x 140KB args:   {timeit(h, *chunks):7.2f} ms/call", flush=True)

    # many OUTPUTS instead of inputs
    k = jax.jit(lambda x: [x + i for i in range(700)])
    ms = timeit(k, x)
    print(f"700 tiny outputs:   {ms:7.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
