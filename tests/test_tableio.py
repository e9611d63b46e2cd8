"""TableIO seam: Parquet fallback paths (Iceberg jar absent in sandbox —
the seam is exercised in its fallback mode, the catalog mode activates
automatically when org.apache.iceberg.spark.SparkCatalog is on the
classpath)."""

from pystreamfs_spark.sources.tableio import TableIO, read_table
from pystreamfs_spark.sources.transcripts import synthesize_transcripts


def test_write_read_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    assert io.iceberg is False  # sandbox: no runtime jar → parquet mode
    t = synthesize_transcripts(spark, n_convs=5, seed=2)
    io.write(t, "transcripts")
    back = io.read("transcripts")
    assert back.count() == t.count()
    assert set(back.columns) == set(t.columns)


def test_epoch_commits_are_idempotent(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    t = synthesize_transcripts(spark, n_convs=4, seed=2)
    io.commit_epoch(t.where("conv_id < 'conv000002'"), "tbl", epoch=0)
    io.commit_epoch(t.where("conv_id >= 'conv000002'"), "tbl", epoch=1)
    n1 = io.read_epochs("tbl").count()
    # re-commit epoch 1 (as a resume retry would): overwrite, not append
    io.commit_epoch(t.where("conv_id >= 'conv000002'"), "tbl", epoch=1)
    n2 = io.read_epochs("tbl").count()
    assert n1 == n2 == t.count()
    eps = {r.epoch for r in io.read_epochs("tbl").select("epoch").distinct().collect()}
    assert eps == {0, 1}


def test_read_table_path_vs_catalog(spark, sf_dir):
    df = read_table(spark, f"{sf_dir}/events.parquet")
    assert df.count() > 0
