"""The CLI entry points (reference README parity) run and print the
reference-shaped metrics block."""

import subprocess
import sys


def test_nb_compat_cli_golden():
    out = subprocess.run(
        [sys.executable, "-m", "text_sentiment_classification_hadoop_spark_spark", "nb-compat",
         "--train", "fixtures/tweets_fixture.csv"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.strip().splitlines()
    got = {l.split(" = ")[0]: l.split(" = ")[1] for l in lines if " = " in l}
    # the golden confusion from test_fixture_e2e, via the CLI surface
    assert (got["True Positives"], got["False Positives"],
            got["True Negatives"], got["False Negatives"]) == ("14", "0", "17", "1")
    assert "Execution time" in out.stdout


def test_curate_cli(tmp_path):
    out_dir = str(tmp_path / "kept")
    out = subprocess.run(
        [sys.executable, "-m", "text_sentiment_classification_hadoop_spark_spark", "curate",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--out", out_dir],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    got = {l.split(" = ")[0]: l.split(" = ")[1]
           for l in out.stdout.strip().splitlines() if " = " in l}
    total = int(got["Documents"])
    kept = int(got["Kept"])
    rejected = sum(int(v) for k, v in got.items() if k.startswith("Rejected["))
    assert total > 0 and kept + rejected == total
    assert "Source " in out.stdout          # per-source report printed
    assert "Kept corpus written" in out.stdout


def test_dedup_cli(tmp_path):
    out_dir = str(tmp_path / "deduped")
    out = subprocess.run(
        [sys.executable, "-m", "text_sentiment_classification_hadoop_spark_spark", "dedup",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--keep", "best", "--score-col", "n_chars",
         "--out", out_dir],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    got = {l.split(" = ")[0]: l.split(" = ")[1]
           for l in out.stdout.strip().splitlines() if " = " in l}
    total = int(got["Documents"])
    kept = int(got["Kept"])
    assert total > 0 and kept + int(got["Duplicates removed"]) == total
    assert "Deduplicated corpus written" in out.stdout


def test_tokenize_train_cli(tmp_path):
    out_dir = str(tmp_path / "merges")
    out = subprocess.run(
        [sys.executable, "-m", "text_sentiment_classification_hadoop_spark_spark", "tokenize-train",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--merges", "8", "--out", out_dir],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    got = {l.split(" = ")[0]: l.split(" = ")[1]
           for l in out.stdout.strip().splitlines() if " = " in l}
    assert int(got["Merges learned"]) == 8
    assert int(got["Words (distinct)"]) > 0
    assert int(got["Subword vocabulary"]) > 0
    assert "Merge table written" in out.stdout


def test_search_cli():
    out = subprocess.run(
        [sys.executable, "-m", "text_sentiment_classification_hadoop_spark_spark", "search",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--query", "table scan merge", "--topk", "5"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Query = 'table scan merge'" in out.stdout
    assert "Hits = " in out.stdout
    assert "doc " in out.stdout


def test_cli_manifest(tmp_path):
    # subprocess like every CLI test: the command stops ITS OWN spark —
    # calling main() in-process would stop the suite's shared session
    out_dir = str(tmp_path / "shards")
    out = subprocess.run(
        [sys.executable, "-m", "text_sentiment_classification_hadoop_spark_spark", "manifest",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--out", out_dir],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Manifest rows = 250" in out.stdout
    assert "Training shards written" in out.stdout
    import os
    assert sorted(d for d in os.listdir(out_dir) if d.startswith("split=")) == \
        ["split=test", "split=train", "split=val"]


def test_cli_explain():
    out = subprocess.run(
        [sys.executable, "-m", "text_sentiment_classification_hadoop_spark_spark", "explain",
         "--query", "pricing_summary"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "== Physical Plan ==" in out.stdout
    assert "Scan parquet" in out.stdout
