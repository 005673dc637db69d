"""Incremental landing discovery: the LandingLedger contract.

Autoloader's defining scale property (``notebooks/demo-notebook.py:
158-167``): a trigger does O(new files) work, never O(all files ever
landed). These tests pin the ledger mechanics directly (watermark,
mtime-tie boundary, write-ahead intent, bootstrap shim) and then drive
the pipeline to show (a) a warm trigger reads only the new files and
(b) a crash between the Bronze append and the ledger's complete()
replays without duplicating rows — the exactly-once story the Spark
streaming checkpoint used to provide.
"""

from __future__ import annotations

import json
import os

from incremental_etl_on_lakehouse_spark.pipeline import MedallionPipeline
from incremental_etl_on_lakehouse_spark.sources.discovery import LandingLedger


def _touch(path, text="x", mtime_ns=None):
    path.write_text(text)
    if mtime_ns is not None:
        os.utime(path, ns=(mtime_ns, mtime_ns))
    return str(path)


def test_ledger_lists_only_new_files(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    led = LandingLedger(str(landing), str(tmp_path / "ledger.json"))
    a = _touch(landing / "a.json", mtime_ns=1_000)
    b = _touch(landing / "b.json", mtime_ns=2_000)
    assert [f for f, _ in led.list_new()] == [a, b]  # (mtime, name) order
    for _ in range(2):
        f, mt = led.list_new()[0]
        led.begin(f, mt)
        led.complete()
    assert led.list_new() == []
    c = _touch(landing / "c.json", mtime_ns=3_000)
    assert [f for f, _ in led.list_new()] == [c]
    # hidden/metadata files are never discovered
    _touch(landing / "_SUCCESS", mtime_ns=4_000)
    _touch(landing / ".crc", mtime_ns=4_000)
    assert [f for f, _ in led.list_new()] == [c]


def test_ledger_mtime_ties_and_persistence(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    loc = str(tmp_path / "ledger.json")
    led = LandingLedger(str(landing), loc)
    a = _touch(landing / "a.json", mtime_ns=5_000)
    b = _touch(landing / "b.json", mtime_ns=5_000)  # same tick
    f, mt = led.list_new()[0]
    assert f == a
    led.begin(f, mt)
    led.complete()
    # reload from disk mid-tick: the boundary set must disambiguate the tie
    led2 = LandingLedger(str(landing), loc)
    assert [f for f, _ in led2.list_new()] == [b]
    c = _touch(landing / "c.json", mtime_ns=5_000)  # late same-tick arrival
    assert [x for x, _ in led2.list_new()] == [b, c]


def test_ledger_pending_intent_survives_restart(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    loc = str(tmp_path / "ledger.json")
    led = LandingLedger(str(landing), loc)
    a = _touch(landing / "a.json", mtime_ns=1_000)
    f, mt = led.list_new()[0]
    bid = led.begin(f, mt)
    # "crash" here: a new ledger instance sees the intent, not a new file
    led2 = LandingLedger(str(landing), loc)
    assert led2.pending() == {"batch_id": bid, "file": a, "mtime_ns": 1_000}
    assert led2.list_new() == []  # watermark unmoved, but intent owns it
    led2.complete()
    assert led2.pending() is None
    led3 = LandingLedger(str(landing), loc)
    assert led3.list_new() == [] and led3.pending() is None


def test_ledger_bootstrap_excludes_prior_history(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    old = _touch(landing / "old.json", mtime_ns=1_000)
    led = LandingLedger(str(landing), str(tmp_path / "ledger.json"))
    led.bootstrap([old], next_batch_id=7)
    new = _touch(landing / "new.json", mtime_ns=2_000)
    assert [f for f, _ in led.list_new()] == [new]
    f, mt = led.list_new()[0]
    assert led.begin(f, mt) == 7  # batch counter seeded past old history


def _rec(i, c, n, ts="2023-01-01 10:00:00"):
    return {
        "id": i, "country": c, "district": "D", "visit_timestamp": ts,
        "num_visitors": n, "cdc_operation": "INSERT", "cdc_timestamp": ts,
    }


def _gold(p):
    return {r["country"]: r["sum_visitors"] for r in p.gold.to_df().collect()}


def test_warm_trigger_reads_only_new_files(spark, tmp_path):
    """O(new) contract end-to-end: after a warm run, a trigger with one
    new landed file ingests exactly that file (ledger discovers 1), and
    an idle trigger discovers 0 and advances no table version."""
    landing = tmp_path / "landing"
    landing.mkdir()
    p = MedallionPipeline(spark, str(tmp_path / "lake"), str(landing))
    for i in range(5):
        (landing / f"f{i}.json").write_text(json.dumps([_rec(i, f"C{i}", 10)]))
    p.run_available()
    assert _gold(p) == {f"C{i}": 10 for i in range(5)}

    led = LandingLedger(
        str(landing), str(tmp_path / "lake" / "_checkpoints" / "landing_ledger.json")
    )
    assert led.list_new() == []  # warm: zero rediscovery of the 5 ingested
    (landing / "f9.json").write_text(json.dumps([_rec(9, "C9", 10)]))
    led2 = LandingLedger(led.landing_path, led.location)
    assert [os.path.basename(f) for f, _ in led2.list_new()] == ["f9.json"]

    versions = (p.bronze.version(), p.silver.version(), p.gold.version())
    p.run_available()
    assert _gold(p)["C9"] == 10
    # exactly one bronze append for the one new file
    assert p.bronze.version() == versions[0] + 1
    p.run_available()  # idle trigger: no versions move
    assert p.bronze.version() == versions[0] + 1


def test_crash_between_append_and_complete_replays_without_dupes(
    spark, tmp_path, monkeypatch
):
    """Crash window: Bronze append committed, ledger complete() never ran.
    The restart replays the intent; the idempotent-txn guard absorbs the
    duplicate append, and complete() finally advances the watermark."""
    landing = tmp_path / "landing"
    landing.mkdir()
    p = MedallionPipeline(spark, str(tmp_path / "lake"), str(landing))
    (landing / "f1.json").write_text(json.dumps([_rec(1, "England", 100)]))
    p.run_available()

    (landing / "f2.json").write_text(json.dumps([_rec(2, "Wales", 50)]))
    real_complete = LandingLedger.complete

    def crash_complete(self):
        raise RuntimeError("crash before ledger complete")

    monkeypatch.setattr(LandingLedger, "complete", crash_complete)
    try:
        p.ingest_available()
    except RuntimeError:
        pass
    monkeypatch.setattr(LandingLedger, "complete", real_complete)

    bronze_v = p.bronze.version()  # f2's append already committed
    p.run_available()  # replays the pending intent
    assert p.bronze.version() == bronze_v  # txn guard: no second append
    ids = sorted(r["id"] for r in p.silver.to_df().collect())
    assert ids == [1, 2]  # no dupes, nothing lost
    assert _gold(p) == {"England": 100, "Wales": 50}


def test_bootstrap_adopts_streaming_checkpoint_history(spark, tmp_path):
    """A pipeline whose Bronze was filled under the old mechanism (no
    ledger on disk) must not re-ingest those files: the bootstrap seeds
    the seen-set from Bronze/quarantine file provenance."""
    landing = tmp_path / "landing"
    landing.mkdir()
    p = MedallionPipeline(spark, str(tmp_path / "lake"), str(landing))
    (landing / "f1.json").write_text(json.dumps([_rec(1, "England", 100)]))
    p.run_available()
    ledger_loc = os.path.join(p.checkpoints, "landing_ledger.json")
    os.remove(ledger_loc)  # simulate pre-ledger history

    bronze_v = p.bronze.version()
    p.run_available()  # bootstrap must mark f1 as seen, ingest nothing
    assert p.bronze.version() == bronze_v
    assert _gold(p) == {"England": 100}
    assert os.path.exists(ledger_loc)
