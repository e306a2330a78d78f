"""Distributed grep golden-count tests mirroring the reference's only
asserted suite (tests/Log Querier/test.py: 600/300/100 per-machine
frequencies + 350 for the /product/\\d+ regex; generator shape from
tests/Log Querier/generate_log.py via FIXTURES.md §3)."""

from __future__ import annotations

import os
import random

import pytest

from stream_processing_spark.sources.grep import dgrep, dgrep_count

FREQ_IP, MED_IP, RARE_IP = "192.168.1.100", "192.168.1.150", "10.0.0.50"
N_MACHINES, LINES = 4, 1000


def _gen_machine_log(path: str, seed: int) -> None:
    rng = random.Random(seed)
    ips = [FREQ_IP] * 600 + [MED_IP] * 300 + [RARE_IP] * 100
    product = [True] * 350 + [False] * 650
    rng.shuffle(ips)
    rng.shuffle(product)
    lines = []
    for ip, prod in zip(ips, product):
        url = f"/product/{rng.randint(1, 101)}" if prod else rng.choice(
            ["/home", "/about", "/contact", "/login", "/logout"]
        )
        method = rng.choice(["GET", "POST", "PUT", "DELETE"])
        status = rng.choice([200, 301, 404, 500])
        size = rng.randint(500, 5000)
        lines.append(
            f'{ip} - - [01/Jan/2026:00:00:00 ] "{method} {url} HTTP/1.1" {status} {size}'
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def logdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("logs")
    for i in range(1, N_MACHINES + 1):
        _gen_machine_log(str(d / f"machine.{i}.log"), seed=42 + i)
    return str(d)


def test_frequent_pattern_counts(spark, logdir):
    rows = dgrep_count(spark, FREQ_IP, f"{logdir}/machine.*.log").collect()
    assert len(rows) == N_MACHINES
    assert all(r.match_count == 600 for r in rows)


def test_medium_and_rare_counts(spark, logdir):
    med = dgrep_count(spark, MED_IP, f"{logdir}/machine.*.log").collect()
    rare = dgrep_count(spark, RARE_IP, f"{logdir}/machine.*.log").collect()
    assert all(r.match_count == 300 for r in med)
    assert all(r.match_count == 100 for r in rare)


def test_regex_product_counts(spark, logdir):
    rows = dgrep_count(spark, r"/product/\d+", f"{logdir}/machine.*.log").collect()
    assert all(r.match_count == 350 for r in rows)
    total = sum(r.match_count for r in rows)
    assert total == 350 * N_MACHINES


def test_dgrep_lines_carry_source(spark, logdir):
    df = dgrep(spark, RARE_IP, f"{logdir}/machine.*.log")
    rows = df.collect()
    assert len(rows) == 100 * N_MACHINES
    assert {r.source_file for r in rows} == {
        f"machine.{i}.log" for i in range(1, N_MACHINES + 1)
    }
    assert all(RARE_IP in r.value for r in rows)


def test_ignore_case(spark, logdir):
    up = dgrep(spark, "get ", f"{logdir}/machine.*.log", ignore_case=True)
    lo = dgrep(spark, "GET ", f"{logdir}/machine.*.log")
    assert up.count() == lo.count() > 0


def test_grep_gzipped_logs(spark, tmp_path):
    """Compressed rotated logs: read.text decompresses .gz transparently —
    grep works over mixed plain + gzipped sources (real log dirs rotate)."""
    import gzip

    d = tmp_path / "gzlogs"
    d.mkdir()
    (d / "machine.1.log").write_text("hit alpha\nmiss beta\nhit gamma\n")
    with gzip.open(d / "machine.2.log.gz", "wt") as f:
        f.write("hit delta\nmiss epsilon\n")

    out = dgrep_count(spark, "hit", str(d / "*"))
    counts = {r["source_file"]: r["match_count"] for r in out.collect()}
    assert counts == {"machine.1.log": 2, "machine.2.log.gz": 1}


def test_csv_quoting_aware_read(spark, tmp_path):
    """The reference splits CSV rows with value.split(',') — quoted commas
    corrupt columns (SURVEY.md §1.2, tests/sample1_op2.py). Our CSV source
    must parse quoting correctly (Traffic_Signs.csv has quoted fields)."""
    p = tmp_path / "signs.csv"
    p.write_text(
        'OBJECTID,Sign_Type,Notes\n'
        '1,Stop,"plain note"\n'
        '2,Yield,"note, with comma"\n'
        '3,"Speed, Limit","a ""quoted"" word"\n'
    )
    df = spark.read.csv(str(p), header=True, quote='"', escape='"')
    rows = {r["OBJECTID"]: (r["Sign_Type"], r["Notes"]) for r in df.collect()}
    assert rows["2"] == ("Yield", "note, with comma")
    assert rows["3"] == ("Speed, Limit", 'a "quoted" word')
    # the reference's naive split would have produced 4 columns for row 2
    naive = "2,Yield,note, with comma".split(",")
    assert len(naive) == 4
