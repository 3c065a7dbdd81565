#!/usr/bin/env python3
"""Full-surface differential sweep at an arbitrary SF tier.

Usage: verify_sweep.py <sfDir> <verifyOutDir> <artifact.json> [timeout_s]

Runs every oracle in <verifyOutDir>/oracle_sql.json through
verify_local.py ONE QUERY PER SUBPROCESS with a wall timeout — some
oracles are deliberately exhaustive (all-pairs verifiers, unrolled
Lloyd/PageRank CTE chains) and at larger tiers the ORACLE, not the
engine, is the bottleneck; those time out and are recorded as
`excluded` rather than blocking the sweep. Writes a JSON artifact:

  {"sf": ..., "ok": [...], "fail": [...], "excluded": [...],
   "counts": {"ok": N, "fail": N, "excluded": N}}

The driver's gate stays the sf0.01 CORRECTNESS file; this sweep is the
scale-differential companion (catches scale-dependent semantics like
the r8 stream-join sealing boundary, which only bound at sf0.1).
"""
import json, subprocess, sys, time


def main():
    sfdir, outdir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout_s = int(sys.argv[4]) if len(sys.argv) > 4 else 180
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok, fail, excluded = [], [], []
    t0 = time.time()
    for i, name in enumerate(sorted(oracle)):
        # --scale: the exhaustive pair/cluster oracle blocks run in
        # their value-identical efficient forms (tools/scale_oracles.py)
        # so the heaviest queries get a real differential at this tier
        # instead of an oracle-side timeout exclusion
        cmd = [sys.executable, "tools/verify_local.py", "--scale",
               sfdir, outdir, name]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=timeout_s)
            line = (r.stdout.strip().splitlines() or [""])[0]
            if line.startswith("OK"):
                ok.append(name)
            else:
                fail.append({"name": name, "detail": line[:300]})
                print(line[:200], flush=True)
        except subprocess.TimeoutExpired:
            excluded.append(name)
            print(f"EXCLUDED {name}: oracle exceeded {timeout_s}s", flush=True)
        if (i + 1) % 20 == 0:
            print(f"... {i + 1}/{len(oracle)} ({time.time() - t0:.0f}s)",
                  flush=True)
    out = {"sf": sfdir, "timeout_s": timeout_s, "ok": ok, "fail": fail,
           "excluded": excluded,
           "counts": {"ok": len(ok), "fail": len(fail),
                      "excluded": len(excluded)}}
    json.dump(out, open(artifact, "w"), indent=1)
    print(f"== {len(ok)} ok, {len(fail)} fail, {len(excluded)} excluded "
          f"-> {artifact}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
