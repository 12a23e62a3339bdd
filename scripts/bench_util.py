"""Shared micro-bench harness for the scripts/ perf tools.

One copy of the fetch-synced timing methodology (the axon tunnel does not
honor block_until_ready, so every window ends with a scalar readback) and
the roofline reporting — previously duplicated across six scripts.
"""

import os
import time

import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197.0   # v5e bf16
HBM_GBS = 819.0


def setup_cache(path: str = "/tmp/jax_cache") -> None:
    """Persistent XLA compile cache so repeat runs skip the compiles."""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters: int = 20):
    """Best-of-3 windows of `iters` dispatches, fetch-synced.

    Returns (seconds_per_call, flops, bytes_accessed) from XLA's cost
    analysis of the compiled fn.
    """
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis() or {}
    fetch = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0]
                                      .astype(jnp.float32)))
    float(fetch(compiled(*args)))  # warm + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(*args)
        float(fetch(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, float(cost.get("flops", 0.0)), float(
        cost.get("bytes accessed", 0.0))


def report(name: str, dt: float, flops: float, nbytes: float = 0.0,
           width: int = 44) -> None:
    """One roofline line: ms, TF/s, %MFU (+ %HBM when bytes are known)."""
    tf = flops / dt / 1e12 if dt else 0.0
    line = (f"  {name:{width}s} {dt*1e3:8.2f} ms  {tf:6.1f} TF/s "
            f"({100*tf/PEAK_TFLOPS:4.1f}% MFU")
    if nbytes:
        bw = nbytes / dt / 1e9
        line += f", {100*bw/HBM_GBS:4.1f}% HBM"
    print(line + ")", flush=True)
