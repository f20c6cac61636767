"""Probe: can serving executables be AOT-serialized on this backend?

VERDICT r3 weak #6 / next #8: cold compiles of the serving programs run
~minutes each on the remote axon compiler even with the persistent
``.jax_cache`` (the cache keys on program + compiler version and stores
backend-IR, but the first build of each program in a fresh environment is
still a remote compile).  Two candidate mitigations:

  1. the persistent compilation cache (already wired via
     gligen_tpu.utils.cache) — measured by re-running bench.py;
  2. ``jax.experimental.serialize_executable`` — pickle the COMPILED
     executable and reload it with zero compile work, viable only if the
     PJRT plugin implements executable (de)serialization.

This probe tests (2) on a small-but-real program (one UNet forward at SD
scale) and prints timings: compile, serialize, deserialize, and run-from-
deserialized.  Exit 0 with "AOT_SUPPORTED" / "AOT_UNSUPPORTED: <why>".

Run on the real chip:  python tools/aot_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gligen_tpu.inference.pipeline import GligenComponents

    comps = GligenComponents.create(dtype=jnp.bfloat16, rng=jax.random.PRNGKey(0))
    b = 2
    x = jnp.zeros((b, 64, 64, 4), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, 77, 768), jnp.float32)
    grounding = {
        "boxes": jnp.zeros((b, 30, 4)),
        "masks": jnp.zeros((b, 30)),
        "positive_embeddings": jnp.zeros((b, 30, 768)),
    }

    def fwd(params, x, t, ctx, g):
        return comps.unet.apply({"params": params}, x, t, ctx, g)

    t0 = time.time()
    lowered = jax.jit(fwd).lower(comps.params["model"], x, t, ctx, grounding)
    compiled = lowered.compile()
    print(f"compile: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    out = compiled(comps.params["model"], x, t, ctx, grounding)
    jax.block_until_ready(out)
    print(f"first run: {time.time() - t0:.2f}s", flush=True)

    try:
        from jax.experimental.serialize_executable import deserialize_and_load, serialize

        t0 = time.time()
        payload, in_tree, out_tree = serialize(compiled)
        print(f"serialize: {time.time() - t0:.1f}s, {len(payload)/1e6:.1f} MB", flush=True)

        t0 = time.time()
        reloaded = deserialize_and_load(payload, in_tree, out_tree)
        print(f"deserialize_and_load: {time.time() - t0:.1f}s", flush=True)

        t0 = time.time()
        out2 = reloaded(comps.params["model"], x, t, ctx, grounding)
        jax.block_until_ready(out2)
        print(f"run from deserialized: {time.time() - t0:.2f}s", flush=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
        print("AOT_SUPPORTED")
    except Exception as e:  # plugin without executable serialization
        print(f"AOT_UNSUPPORTED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
