"""The production runbook, end to end through the CLI: the command
sequence a user actually runs over a raw corpus —

  1. dq-check        gate the raw table on its declarative contract,
  2. corpus-pipeline build the cleaned corpus (same contract re-checked
                     as the in-pipeline pre-gate),
  3. quality-score   learned quality gate over the shipped corpus,
  4. pack            fixed-token-budget training bins —

asserting the chained artifacts compose: every scored doc is a corpus
doc, every packed doc is a corpus doc, and each stage exits 0."""

import json

from pyspark.sql import functions as F

from asvsp_spark.cli import main
from tests.conftest import SF_DIR


def test_cli_production_runbook(spark, tmp_path, capsys):
    contract = str(tmp_path / "contract.json")
    with open(contract, "w") as fh:
        json.dump([{"check": "unique", "column": "doc_id"},
                   {"check": "not_null", "column": "text"},
                   {"check": "min_rows", "threshold": 1}], fh)

    # 1. gate the raw table
    assert main(["dq-check", f"{SF_DIR}/documents.parquet",
                 "--checks", contract, "--table", "documents"]) == 0
    assert "3/3 checks passed" in capsys.readouterr().out

    # 2. build the corpus behind the same contract
    out = str(tmp_path / "clean")
    assert main(["corpus-pipeline", "--sf-dir", SF_DIR,
                 "--out-dir", out, "--contract", contract]) == 0
    corpus = spark.read.parquet(f"{out}/corpus")
    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert corpus_ids

    # 3. learned quality gate over exactly the shipped corpus
    scores_out = str(tmp_path / "scores")
    assert main(["quality-score", f"{out}/corpus", scores_out,
                 "--tau", "0.5", "--features", "16384",
                 "--max-iter", "5"]) == 0
    scores = spark.read.parquet(scores_out)
    assert scores.count() == len(corpus_ids)
    assert {r.doc_id for r in scores.select("doc_id").collect()} \
        == corpus_ids

    # 4. pack the corpus into training bins
    bins_out = str(tmp_path / "bins")
    assert main(["pack", f"{out}/corpus", bins_out,
                 "--budget", "256", "--shards", "2"]) == 0
    packed = spark.read.parquet(bins_out)
    assert packed.count() == len(corpus_ids)
    assert {r.doc_id for r in packed.select("doc_id").collect()} \
        == corpus_ids
    # contiguous-packing contract: every doc's bin is the 256-token
    # block its start offset falls in (a straddling doc belongs to the
    # bin where it starts)
    bad = packed.filter(
        F.col("bin_id") != F.floor(F.col("start_offset") / 256)).count()
    assert bad == 0
