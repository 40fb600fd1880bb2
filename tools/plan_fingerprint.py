"""Plan-fingerprint ledger: machine-detect "driver verdict is stale".

VERDICT r8 item 3: re-adjudication picks were curated by hand from
memory of which rounds touched which plans — q141's r7 slip ("no
driver verdict yet" when it had an r3 one on a superseded plan) shows
the failure mode.  This tool records a normalized fingerprint per
query; any query whose CURRENT fingerprint differs from the one
recorded at its last driver verdict is flagged for re-adjudication,
and tests/test_plan_fingerprints.py fails if such a query is absent
from ``__spark_entry__._ADJUDICATE_FIRST``.

Fingerprint = md5 over
  * the normalized ANALYZED plan of the query at the ledger sf_dir
    (expression ids and lambda variables renumbered in
    first-appearance order, data paths folded to <SF> — so the hash is
    stable across sessions, build order, and memo warmth: a
    memo-reused LogicalRDD and a freshly checkpointed one normalize to
    the same string), plus
  * the query's DuckDB oracle SQL text (an oracle re-derivation — as
    in q141 r8 — also invalidates a verdict).

The ANALYZED (pre-optimizer) plan is used on purpose: it is the
deterministic product of the repo's builder code — exactly what a
repo edit changes — and is independent of AQE, physical strategy
picks, and optimizer-internal nondeterminism (RewriteDistinctAggregates
assigns grouping-set gid branches in unstable order, observed on
q214).  Optimizer behavior shifts come from Spark version bumps, not
repo edits, and are out of scope for verdict staleness.  A change
hidden ENTIRELY behind a localCheckpoint that alters neither the
final plan nor the oracle is invisible here — but such a change
either alters results (caught by tools/driver_replay.py) or is
perf-only.

Ledger protocol (PLAN_FINGERPRINTS.json):
  * bootstrap (once, r9): record all queries at their current plans.
  * at each round START, after the driver wrote CORRECTNESS_r{N}:
    ``python tools/plan_fingerprint.py --update`` refreshes exactly
    the entries whose latest green verdict round is NEWER than the
    recorded one (the driver adjudicated the round-close tree, which
    is the tree at next round start — so the current fingerprint IS
    the at-verdict fingerprint) plus any new/unrecorded names.
  * plain run = check mode: prints drift, exit 1 if a drifted query
    is not staged for re-adjudication.

Usage:
  python tools/plan_fingerprint.py [--bootstrap | --update] [name ...]
"""

import hashlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from crypto_prediction_etl_spark.plans import registry  # noqa: E402

LEDGER = os.path.join(REPO, "PLAN_FINGERPRINTS.json")
SF_DIR = "/root/testdata/sf0.01"

_EXPR_ID = re.compile(r"#(\d+)")
_PATH = re.compile(r"/root/testdata/\S+")
_PLAN_ID = re.compile(r"plan_id=\d+")
# higher-order-function variables carry a session-global counter
# ("lambda x_1#14L" vs "lambda x_2#14L" for the same code)
_LAMBDA_VAR = re.compile(r"\blambda ([A-Za-z]\w*?)_\d+")


def normalize_plan(plan: str) -> str:
    """Session-independent canonical form of a plan string."""
    plan = _PATH.sub("<SF>", plan)
    plan = _PLAN_ID.sub("plan_id=N", plan)
    plan = _LAMBDA_VAR.sub(r"lambda \1_N", plan)
    seen: dict[str, str] = {}

    def renumber(m: re.Match) -> str:
        raw = m.group(1)
        if raw not in seen:
            seen[raw] = str(len(seen))
        return "#" + seen[raw]

    return _EXPR_ID.sub(renumber, plan)


def fingerprint(spark, name: str, sf_dir: str = SF_DIR) -> str:
    df = registry.QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed().toString()
    blob = (
        normalize_plan(plan)
        + "\n==oracle==\n"
        + registry.ORACLES.get(name, "")
    )
    return hashlib.md5(blob.encode()).hexdigest()


def load_ledger() -> dict:
    if not os.path.exists(LEDGER):
        return {"sf_dir": SF_DIR, "entries": {}}
    with open(LEDGER) as f:
        return json.load(f)


def latest_green_round(repo: str) -> dict[str, int]:
    """name -> highest round number with a green driver verdict."""
    import glob

    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as f:
            payload = json.load(f)
        entries = payload.get("queries", payload)
        if not isinstance(entries, dict):
            continue
        for k, v in entries.items():
            if (
                isinstance(v, dict)
                and v.get("rows_match") is True
                and v.get("hash_match") is True
                and v.get("err") is None
            ):
                out[k] = max(out.get(k, 0), rnd)
    return out


def compute_all(spark, names=None) -> dict[str, str]:
    names = list(names or registry.QUERIES)
    fps = {}
    for i, n in enumerate(names):
        fps[n] = fingerprint(spark, n)
        if (i + 1) % 50 == 0:
            print(f"  fingerprinted {i + 1}/{len(names)}", file=sys.stderr)
    return fps


def main() -> int:
    mode = "check"
    argv = sys.argv[1:]
    if argv and argv[0] in ("--bootstrap", "--update"):
        mode = argv[0][2:]
        argv = argv[1:]

    registry.load_all()
    from crypto_prediction_etl_spark.session import get_spark

    spark = get_spark("plan-fingerprint")
    spark.sparkContext.setLogLevel("ERROR")

    names = argv or list(registry.QUERIES)
    fps = compute_all(spark, names)
    verdict_rounds = latest_green_round(REPO)
    ledger = load_ledger()
    entries = ledger["entries"]

    import __spark_entry__ as entry_mod

    staged = set(entry_mod._ADJUDICATE_FIRST)

    drifted = sorted(
        n
        for n in names
        if n in entries and entries[n]["fp"] != fps[n]
    )
    missing = sorted(n for n in names if n not in entries)
    unstaged_drift = [n for n in drifted if n not in staged]

    if mode == "bootstrap":
        for n in names:
            entries[n] = {
                "fp": fps[n],
                "verdict_round": verdict_rounds.get(n),
            }
    elif mode == "update":
        for n in names:
            rec = entries.get(n)
            newer_verdict = rec is not None and (
                verdict_rounds.get(n) or 0
            ) > (rec["verdict_round"] or 0)
            if rec is None or newer_verdict:
                entries[n] = {
                    "fp": fps[n],
                    "verdict_round": verdict_rounds.get(n),
                }
    if mode in ("bootstrap", "update"):
        ledger["entries"] = dict(sorted(entries.items()))
        with open(LEDGER, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
            f.write("\n")

    print(
        json.dumps(
            {
                "metric": "plan_fingerprint",
                "mode": mode,
                "checked": len(names),
                "drifted": drifted,
                "unstaged_drift": unstaged_drift,
                "missing_from_ledger": len(missing),
            }
        )
    )
    return 1 if mode == "check" and unstaged_drift else 0


if __name__ == "__main__":
    sys.exit(main())
