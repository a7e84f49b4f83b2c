"""Minimized repro: XLA:CPU segfault after ~hundreds of distinct compiles.

Observed in this repo's CI (CLAUDE.md "Environment gotchas"): a single-process
full pytest run (``-n 0``) exits 139 (SIGSEGV) inside ``backend_compile`` after
roughly 390 accumulated XLA:CPU compilations; every test passes standalone and
the suite passes under pytest-xdist workers (fewer compiles per process). The
faulthandler dump ends in the "Extension modules" list with the crash frame in
the XLA CPU client.

This script strips the repro to its core: compile N DISTINCT tiny programs
(distinct shapes force fresh compilations — the cache can't absorb them) in one
process and report how far it got. Run:

    python tools/xla_cpu_segfault_repro.py [N]            # default 600

Exit 139 before printing "survived" reproduces the bug. Intended for an
upstream https://github.com/jax-ml/jax issue — this environment has no network
egress, so the repro is recorded here instead of filed; file it verbatim when
egress is available, with the jax/jaxlib versions printed below.

STATUS (round 4, 2026-08-18): NOT yet minimized. Both modes survive on the
failing machine — 600 tiny distinct compiles (default mode) and 500
scan+cholesky+while_loop compiles (--suite-like) ran clean, so accumulated
compile COUNT alone is not the trigger. The crash remains reproducible only
under the full single-process pytest run (~390 compiles deep, with pallas
interpret-mode tests and hundreds of MB of live test arrays in the mix).
Next minimization candidates: pallas interpret-mode calls interleaved with
XLA:CPU compiles; allocator pressure (large live buffers during compile);
pytest's assertion-rewriting import hooks. Until minimized, the suite pins
``-n 4`` xdist workers (pyproject addopts) as the mitigation.
"""

import faulthandler
import sys

faulthandler.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(n: int = 600, suite_like: bool = False) -> None:
    print(f"jax {jax.__version__} on {jax.default_backend()} "
          f"(python {sys.version.split()[0]}, suite_like={suite_like})",
          flush=True)
    for i in range(n):
        # distinct shape + distinct constant => a genuinely fresh compile
        k = 8 + i

        if suite_like:
            # the shapes this repo's suite compiles by the hundred: scans
            # with matmul/cholesky bodies and while_loops
            @jax.jit
            def f(x, k=k):
                m = jnp.eye(3) * (1.0 + (k % 5)) + 0.1
                c = jnp.linalg.cholesky(m @ m.T)

                def body(carry, z):
                    return carry @ c + z, carry.sum()

                carry, outs = jax.lax.scan(
                    body, x.reshape(1, 3) @ c,
                    jnp.ones((k % 13 + 2, 1, 3), jnp.float32))
                return outs.sum() + jax.lax.while_loop(
                    lambda v: v < k, lambda v: v + 1, 0).astype(jnp.float32)

            float(f(jnp.ones((3,), jnp.float32)))
        else:
            @jax.jit
            def f(x, k=k):
                return (x * (k % 7 + 1) + jnp.arange(k, dtype=jnp.float32)).sum()

            float(f(jnp.ones((k,), jnp.float32)))
        if (i + 1) % 50 == 0:
            print(f"  {i + 1} compiles ok", flush=True)
    print(f"survived {n} distinct XLA:CPU compiles — no repro at this count",
          flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--suite-like"]
    main(int(args[0]) if args else 600, suite_like="--suite-like" in sys.argv)
