"""Merge the reps-200 operator re-pass into BENCH_SUITE.json.

Re-pass lines (suite schema) replace same-(metric, degree, ndofs) entries;
new combinations are appended before the CG/headline entries.

Run: python experiments/merge_suite.py <repass.jsonl> [BENCH_SUITE.json]
"""

import json
import sys


def main():
    repass_path = sys.argv[1]
    suite_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SUITE.json"
    with open(suite_path) as f:
        doc = json.load(f)
    repass = []
    with open(repass_path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                repass.append(json.loads(line))

    def key(r):
        return (r.get("metric"), r.get("degree"), r.get("ndofs"))

    by_key = {key(r): r for r in repass}
    out = []
    for r in doc["results"]:
        out.append(by_key.pop(key(r), r))
    # leftovers: new (metric, degree, size) combos
    out.extend(by_key.values())
    doc["results"] = out
    with open(suite_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"merged {len(repass)} re-pass entries; total {len(out)}")


if __name__ == "__main__":
    main()
