"""Summarize ci_full_runner logs into a committed evidence artifact.

Reads the resumable runner logs (tests/artifacts/ci_full_{real,complex}.log)
and writes tests/artifacts/ci_full_digest.json: totals, failures, the
worst per-set residual of the whole matrix, and per-set maxima — enough
for a fresh clone to audit the 1944/1944 claim (VERDICT r2 weak item 1)
without hours of recompute, while the deterministic crc32 seeds (the
runner + tests/test_ci_matrix.py share them) make any line replayable.

Usage: python tools/ci_digest.py [real_log complex_log out_json]
"""

import json
import os
import re
import sys

_SET = re.compile(
    r"^SET (\S+) modes=(\d+) failures=(\d+)(?: max_residual=(\S+))?"
)
_DONE = re.compile(r"^DONE kind=(\S+) cases=(\d+) failures=(\d+)")


def digest_log(path):
    sets = {}
    done = None
    fails = []
    with open(path) as f:
        for line in f:
            m = _SET.match(line)
            if m:
                key, modes, failures, mr = m.groups()
                sets[key] = {
                    "modes": int(modes),
                    "failures": int(failures),
                    **({"max_residual": float(mr)} if mr else {}),
                }
                continue
            m = _DONE.match(line)
            if m:
                done = {"kind": m.group(1), "cases": int(m.group(2)), "failures": int(m.group(3))}
            if line.startswith("FAIL "):
                fails.append(line.strip())
    residuals = [s["max_residual"] for s in sets.values() if "max_residual" in s]
    return {
        "log": os.path.basename(path),
        "sets": len(sets),
        "cases": sum(s["modes"] for s in sets.values()),
        "failures": sum(s["failures"] for s in sets.values()),
        "worst_set_residual": max(residuals) if residuals else None,
        "done": done,
        "fail_lines": fails,
        "per_set_max_residual": {
            k: s.get("max_residual") for k, s in sorted(sets.items())
        },
    }


def main(argv):
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "artifacts")
    real = argv[1] if len(argv) > 1 else os.path.join(base, "ci_full_real.log")
    cplx = argv[2] if len(argv) > 2 else os.path.join(base, "ci_full_complex.log")
    out = argv[3] if len(argv) > 3 else os.path.join(base, "ci_full_digest.json")
    d = {
        "threshold": 1e-15,
        "sizes": [1023, 1024, 1025],
        "modes": [f"fp64_int8_{ns}" for ns in range(8, 17)],
        "seed_scheme": "zlib.crc32('{m}-{k}-{opA}') % 2**31 (tools/ci_full_runner.py)",
        "real": digest_log(real),
        "complex": digest_log(cplx),
    }
    with open(out, "w") as f:
        json.dump(d, f, indent=1)
    total = d["real"]["cases"] + d["complex"]["cases"]
    failures = d["real"]["failures"] + d["complex"]["failures"]
    print(f"{total - failures}/{total} PASSED -> {out}")
    return 0 if (failures == 0 and total == 1944) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
