"""Crash-recovery fuzzing for the generic CdcMedallionPipeline: randomized
kill points across every medallion seam — landing-ledger completion,
Bronze/quarantine appends, the Silver CDC merge, the Gold additive merge,
and the stream-reader checkpoint writes — each fired BEFORE or AFTER the
real operation. After every crash a fresh pipeline object (restart
stand-in) resumes; the txn-guard/checkpoint pairs must converge to
exactly the state of an uncrashed reference run on the same landing
files. This is the SINK-side complement of the byte-pacing source fuzzer
(tests/test_stream_pacing.py)."""

import json
import os
import random

import pytest

import incremental_etl_on_lakehouse_spark.pipeline as pl
from incremental_etl_on_lakehouse_spark.lake.streaming import Checkpoint
from incremental_etl_on_lakehouse_spark.lake.table import LakeTable
from incremental_etl_on_lakehouse_spark.pipeline import CdcMedallionPipeline
from incremental_etl_on_lakehouse_spark.sources.discovery import LandingLedger


class InjectedCrash(RuntimeError):
    pass


class CrashPlan:
    """One armed crash: fire at the n-th call of one seam, before or
    after the real operation. Disarms after firing."""

    def __init__(self, seam: str, nth: int, when: str):
        self.seam, self.nth, self.when = seam, nth, when
        self.counts: dict[str, int] = {}
        self.fired = False

    def hit(self, seam: str, real, *a, **k):
        n = self.counts.get(seam, 0) + 1
        self.counts[seam] = n
        mine = (not self.fired) and seam == self.seam and n == self.nth
        if mine and self.when == "before":
            self.fired = True
            raise InjectedCrash(f"{seam}#{n} before")
        out = real(*a, **k)
        if mine and self.when == "after":
            self.fired = True
            raise InjectedCrash(f"{seam}#{n} after")
        return out


SEAMS = [
    "ledger_complete",
    "bronze_append",
    "silver_merge",
    "gold_merge",
    "checkpoint_write",
]


def _install(monkeypatch, plan: CrashPlan):
    real_complete = LandingLedger.complete
    monkeypatch.setattr(
        LandingLedger,
        "complete",
        lambda self: plan.hit("ledger_complete", real_complete, self),
    )
    real_append = LakeTable.append
    monkeypatch.setattr(
        LakeTable,
        "append",
        lambda self, *a, **k: plan.hit(
            "bronze_append", real_append, self, *a, **k
        ),
    )
    real_mcb = pl.merge_cdc_batch
    monkeypatch.setattr(
        pl,
        "merge_cdc_batch",
        lambda *a, **k: plan.hit("silver_merge", real_mcb, *a, **k),
    )
    real_mad = pl.merge_agg_delta
    monkeypatch.setattr(
        pl,
        "merge_agg_delta",
        lambda *a, **k: plan.hit("gold_merge", real_mad, *a, **k),
    )
    real_ckw = Checkpoint.write
    monkeypatch.setattr(
        Checkpoint,
        "write",
        lambda self, v: plan.hit("checkpoint_write", real_ckw, self, v),
    )


def _land(landing: str, fname: str, rows) -> None:
    recs = [
        {
            "id": i,
            "country": c,
            "district": "d",
            "visit_timestamp": ts,
            "num_visitors": n,
            "cdc_operation": op,
            "cdc_timestamp": ts,
        }
        for (i, c, n, op, ts) in rows
    ]
    with open(os.path.join(landing, fname), "w") as f:
        f.write("\n".join(json.dumps(r) for r in recs))


def _waves(rng: random.Random):
    """Three landing waves of randomized CDC records over a small key
    space — inserts, updates, deletes, and a malformed file."""
    countries = ["AU", "NZ", "FJ"]
    t = [0]

    def ts():
        t[0] += 1
        return f"2023-01-01 00:{t[0] // 60:02d}:{t[0] % 60:02d}"

    waves = []
    for w in range(3):
        rows = []
        for _ in range(rng.randint(2, 5)):
            i = rng.randint(1, 6)
            op = rng.choice(
                ["INSERT", "UPDATE", "UPDATE", "DELETE"] if w else ["INSERT"]
            )
            rows.append((i, countries[i % 3], rng.randint(1, 100), op, ts()))
        waves.append(rows)
    return waves


def _final_states(p: CdcMedallionPipeline):
    silver = sorted(
        (r["id"], r["country"], r["num_visitors"])
        for r in p.silver.to_df().collect()
    )
    gold = sorted(
        (r["country"], r["sum_visitors"]) for r in p.gold.to_df().collect()
    )
    bronze = sorted(
        (r["id"], r["num_visitors"], r["cdc_operation"],
         os.path.basename(r["file_name"] or ""))
        for r in p.bronze.to_df().collect()
    )
    return bronze, silver, gold


def _mk(spark, root, landing):
    return CdcMedallionPipeline(
        spark,
        root,
        landing,
        key_cols=["id"],
        order_col="cdc_timestamp",
        gold_group_cols=["country"],
        gold_value_col="num_visitors",
        gold_agg_col="sum_visitors",
    )


@pytest.mark.parametrize("seed", range(4))
def test_pipeline_crash_recovery_fuzz(spark, tmp_path, monkeypatch, seed):
    rng = random.Random(12_800 + seed)
    waves = _waves(rng)

    # reference: uncrashed run over the same landing content
    ref_landing = str(tmp_path / "ref_landing")
    os.makedirs(ref_landing)
    ref = _mk(spark, str(tmp_path / "ref_lake"), ref_landing)
    for w, rows in enumerate(waves):
        _land(ref_landing, f"w{w}.json", rows)
        ref.run_available()
    expected = _final_states(ref)

    # crashing run: same files, fresh pipeline object after every crash
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    root = str(tmp_path / "lake")
    crashes = 0
    for w, rows in enumerate(waves):
        _land(landing, f"w{w}.json", rows)
        if w == 1:  # a malformed file rides along mid-stream
            with open(os.path.join(landing, "bad.json"), "w") as f:
                f.write("{definitely not json")
        # keep crashing this wave until a run gets through clean
        for _attempt in range(12):
            # wave 0's first attempt always fires (ledger_complete runs
            # for every new file), guaranteeing each seed exercises at
            # least one genuine crash/resume cycle; later plans randomize
            # across seams, and an over-shot nth simply completes clean
            if w == 0 and _attempt == 0:
                plan = CrashPlan("ledger_complete", 1, rng.choice(
                    ["before", "after"]))
            else:
                plan = CrashPlan(
                    seam=rng.choice(SEAMS),
                    nth=1 if rng.random() < 0.7 else 2,
                    when=rng.choice(["before", "after"]),
                )
            _install(monkeypatch, plan)
            try:
                _mk(spark, root, landing).run_available()
            except InjectedCrash:
                crashes += 1
                continue
            finally:
                monkeypatch.undo()
            break
        else:
            raise AssertionError("wave never completed")
        # idempotence: an immediate clean re-run changes nothing
        p = _mk(spark, root, landing)
        p.run_available()
        v = (p.bronze.version(), p.silver.version(), p.gold.version())
        p.run_available()
        assert (
            p.bronze.version(), p.silver.version(), p.gold.version()
        ) == v, (seed, w, "re-run advanced versions")

    got = _final_states(_mk(spark, root, landing))
    assert got == expected, (seed, crashes, got, expected)
    assert crashes > 0, "fuzz never injected a crash"
