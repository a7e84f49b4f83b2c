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
compile COUNT alone is not the trigger.

STATUS (round 5, 2026-08-19): both remaining suspects ELIMINATED, singly and
combined: ``--suite-like --pallas --pressure-mb 600`` (450 suite-like
compiles interleaved 1-in-3 with pallas interpret-mode kernel calls while
holding ~600 MB of live host+device buffers) survives, and the same
combination run INSIDE pytest (assertion-rewriting import hooks active,
fresh test module) also survives. Everything this harness can isolate is
clean; the crash reproduces only in the full single-process suite, which
additionally differs by: hundreds of DISTINCT compiled executables held
live (not just compile count — module teardown frees ours each iteration),
cross-test thread hops (see mcport/serve.py note in CLAUDE.md — XLA:CPU is
known to crash on many-thread work migration in this build), and the
fixture/module import graph. Those require bisecting the real suite, which
costs hours per run at -n 0; with the -n 4 cage in place and zero user
impact, further minimization is parked until the bug can be filed upstream
(needs egress) with this harness attached as the "what it is NOT" half.
"""

import faulthandler
import sys
from pathlib import Path

# repo root on sys.path: the --pallas mode imports mcport, which is not
# installed — without this the documented repro command dies at its first
# pallas iteration with ModuleNotFoundError (review r5)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

faulthandler.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(n: int = 600, suite_like: bool = False, pallas: bool = False,
         pressure_mb: int = 0) -> None:
    print(f"jax {jax.__version__} on {jax.default_backend()} "
          f"(python {sys.version.split()[0]}, suite_like={suite_like}, "
          f"pallas={pallas}, pressure_mb={pressure_mb})", flush=True)
    ballast = []
    if pressure_mb:
        import numpy as np

        # live host + device buffers held across every compile (allocator-
        # pressure suspect): half numpy, half committed jax arrays
        per = max(pressure_mb // 20, 1)
        for j in range(10):
            ballast.append(np.ones((per * 1024 * 1024 // 4,), np.float32))
            ballast.append(jnp.ones((per * 1024 * 1024 // 4,), jnp.float32))
        jax.block_until_ready(ballast[-1])
        print(f"  holding ~{pressure_mb} MB live across compiles", flush=True)
    for i in range(n):
        # distinct shape + distinct constant => a genuinely fresh compile
        k = 8 + i

        if pallas and i % 3 == 2:
            # pallas interpret-mode call interleaved with the XLA compiles
            # (the suite runs hundreds of these; interpret mode stacks the
            # Threefry bit source + pure_callback machinery on the same
            # process): distinct (n_paths, steps) => fresh interpret trace
            from mcport.ops.pallas_gbm import pallas_terminal_log_returns

            import numpy as np

            chol = np.eye(2, dtype=np.float32) * 0.02
            term = pallas_terminal_log_returns(
                jnp.int32(i), np.zeros(2, np.float32), chol,
                128 + 8 * (i % 7), 2 + i % 5, block=128, interpret=True)
            float(term.sum())
            continue

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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=600)
    ap.add_argument("--suite-like", action="store_true")
    ap.add_argument("--pallas", action="store_true",
                    help="interleave pallas interpret-mode kernel calls "
                         "(suspect: interpret machinery x XLA compiles)")
    ap.add_argument("--pressure-mb", type=int, default=0,
                    help="hold this many MB of live host+device buffers "
                         "across every compile (suspect: allocator pressure)")
    a = ap.parse_args()
    main(a.n, suite_like=a.suite_like, pallas=a.pallas,
         pressure_mb=a.pressure_mb)
