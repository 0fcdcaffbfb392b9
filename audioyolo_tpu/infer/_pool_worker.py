"""Worker entry point for :mod:`audioyolo_tpu.infer.pool` — run as
``python -m audioyolo_tpu.infer._pool_worker`` (separate module so runpy
does not re-execute the pool module the parent already imported).

Protocol: first stdin line = pool spec (factory + eval kwargs); every later
line = one job; one JSON response line per job on stdout. Set
``AYT_WORKER_PLATFORM`` to force a jax backend before any model import
(env-var platform selection alone is too late once sitecustomize has
pre-imported jax).
"""

from __future__ import annotations

import json
import os
import sys


def _worker_main() -> int:
    plat = os.environ.get("AYT_WORKER_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    spec = json.loads(sys.stdin.readline())
    sys.path.insert(0, spec["cwd"])
    import importlib

    mod_name, fn_name = spec["factory"].split(":")
    factory = getattr(importlib.import_module(mod_name), fn_name)
    infer_fn, frame_fn = factory(**spec["factory_kwargs"])
    ek = dict(spec["eval_kwargs"])
    ek["idx2class_map"] = {int(k): v for k, v in spec["idx2class_map"].items()}
    ek["frame_fn"] = frame_fn

    from .pool import save_rows
    from .streaming import evaluate_audio

    resampler_cache: dict = {}
    probe_state: dict = {}  # buffer staged by probe_prep for probe_go
    for line in sys.stdin:
        job = json.loads(line)
        try:
            if job["op"] == "ping":
                out = {"ok": True}
            elif job["op"] == "probe":
                # time a host->device put of ``mb`` MB so the pool can detect
                # whether the transfer cap is per-process or global that day
                # (infer/pool.py::detect_regime). A tiny fetch first flips
                # this process into the journaled-put regime streaming runs
                # in; random bytes defeat any compression in the transport.
                import time

                import jax
                import numpy as np

                mb = float(job.get("mb", 32.0))
                arr = np.frombuffer(os.urandom(int(mb * 1e6)), np.uint8)
                np.asarray(jax.device_put(np.zeros((1,), np.float32)))
                t0 = time.perf_counter()
                jax.block_until_ready(jax.device_put(arr))
                out = {"ok": True, "seconds": time.perf_counter() - t0, "mb": mb}
            elif job["op"] == "probe_prep":
                # stage the buffer + enter the journaled-put regime NOW so
                # the later "probe_go" measures only the put — the prep/go
                # split is the start barrier that makes concurrent probes
                # actually overlap on a 1-core host (without it, staggered
                # job pickup can serialize the puts and a globally-capped
                # pipe measures solo speed per worker)
                import jax
                import numpy as np

                mb = float(job.get("mb", 32.0))
                probe_state["mb"] = mb
                probe_state["buf"] = np.frombuffer(
                    os.urandom(int(mb * 1e6)), np.uint8
                )
                np.asarray(jax.device_put(np.zeros((1,), np.float32)))
                out = {"ok": True}
            elif job["op"] == "probe_go":
                # wall-clock epochs (time.time) are comparable across the
                # pool's processes on one host: the parent aggregates over
                # the union span [min(t0), max(t1)] of the actual puts
                import time

                import jax

                t0 = time.time()
                jax.block_until_ready(jax.device_put(probe_state["buf"]))
                t1 = time.time()
                out = {"ok": True, "t0": t0, "t1": t1,
                       "seconds": t1 - t0, "mb": probe_state["mb"]}
                probe_state.pop("buf", None)  # one-shot: release the MBs
            elif job["op"] == "span":
                rows = evaluate_audio(
                    infer_fn,
                    job["path"],
                    "",
                    return_rows=True,
                    chunk_range=(job["c0"], job["c1"]),
                    _resampler_cache=resampler_cache,
                    **ek,
                )
                save_rows(job["rows_out"], rows)
                out = {"ok": True, "rows_out": job["rows_out"]}
            elif job["op"] == "files":
                # per-file isolation: one bad file must not abort the rest
                # of the shard (the threaded runner path surfaces per-file
                # errors after the others complete — same contract here)
                n_ok, errors = 0, []
                for p in job["paths"]:
                    try:
                        evaluate_audio(
                            infer_fn,
                            p,
                            job["output_dir"],
                            _resampler_cache=resampler_cache,
                            **ek,
                        )
                        n_ok += 1
                    except Exception as e:
                        import traceback

                        traceback.print_exc(file=sys.stderr)
                        errors.append({"path": p, "error": f"{type(e).__name__}: {e}"})
                out = {"ok": True, "n": n_ok, "errors": errors}
            else:
                out = {"ok": False, "error": "unknown op %r" % (job["op"],)}
        except Exception as e:  # report, keep serving
            import traceback

            traceback.print_exc(file=sys.stderr)
            out = {"ok": False, "error": f"{type(e).__name__}: {e}"}
        sys.stdout.write(json.dumps(out) + "\n")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(_worker_main())
