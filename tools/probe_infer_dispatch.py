"""One-off: split batch-1 eval forward wall time into device time vs
tunnel/host dispatch overhead.

bench.py's b1/b4 arithmetic implies ~40 ms of per-dispatch fixed cost
(57.8 ms/img at b1 vs 27.2 at b4). This probe measures (a) a trivial
jitted dispatch loop, (b) the b1 eval forward loop, (c) a traced b1
device time, to decide whether the gap is model work or PJRT-tunnel
dispatch latency that real (untunneled) deployments would not pay.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from cpm_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from __graft_entry__ import _flagship_cfg
    from cpm_tpu.data.synthetic import synthetic_batch
    from cpm_tpu.engine.train import create_train_state
    from cpm_tpu.utils.amp import cast_floating_to, compute_dtype

    # trivial dispatch cost
    f = jax.jit(lambda x: x + 1)
    x = jax.device_put(jnp.zeros((8,), jnp.float32))
    f(x).block_until_ready()
    t0 = time.time()
    y = x
    for _ in range(50):
        y = f(y)
    y.block_until_ready()
    print(f"trivial chained dispatch: {(time.time()-t0)/50*1e3:.2f} ms/call", flush=True)
    t0 = time.time()
    for _ in range(20):
        f(x).block_until_ready()
    print(f"trivial sync dispatch:    {(time.time()-t0)/20*1e3:.2f} ms/call", flush=True)

    cfg = _flagship_cfg(tiny=False)
    eb0 = synthetic_batch(batch_size=1, height=832, width=1344, max_gt=8,
                          num_classes=81, seed=0)
    model, _tx, state = create_train_state(cfg, jax.random.PRNGKey(0), eb0)
    cdtype = compute_dtype(cfg)
    eval_params = cast_floating_to(state.params, cdtype)

    @jax.jit
    def forward(p, images, image_sizes):
        return model.apply({"params": p}, images.astype(cdtype),
                           image_sizes, train=False)

    eb = synthetic_batch(batch_size=1, height=832, width=1344, max_gt=8,
                         num_classes=81, seed=1)
    images = jax.device_put(eb["images"])
    sizes = jax.device_put(eb["image_sizes"])
    d = forward(eval_params, images, sizes)
    float(d.scores.sum())
    # pipelined loop (bench's throughput pattern)
    t0 = time.time(); pend = None
    for _ in range(12):
        cur = forward(eval_params, images, sizes)
        if pend is not None:
            float(pend.scores.sum())
        pend = cur
    float(pend.scores.sum())
    print(f"b1 pipelined: {(time.time()-t0)/12*1e3:.1f} ms/img", flush=True)
    # deep-pipeline: dispatch all 12, then read all (device-bound limit)
    t0 = time.time()
    outs = [forward(eval_params, images, sizes) for _ in range(12)]
    for o in outs:
        float(o.scores.sum())
    print(f"b1 deep-pipelined (12 in flight): {(time.time()-t0)/12*1e3:.1f} ms/img", flush=True)
    # traced device time
    out = os.environ.get("PROBE_TRACE", "/root/repo/.parity_cache/trace_eval_b1")
    jax.profiler.start_trace(out)
    t0 = time.time()
    outs = [forward(eval_params, images, sizes) for _ in range(8)]
    for o in outs:
        float(o.scores.sum())
    dt = time.time() - t0
    jax.profiler.stop_trace()
    print(f"traced: {dt/8*1e3:.1f} ms/img -> {out}", flush=True)

if __name__ == "__main__":
    main()
