from pystreamfs_spark.sources.transcripts import synthesize_transcripts
from pystreamfs_spark.sources.tableio import TableIO, read_table

__all__ = ["synthesize_transcripts", "TableIO", "read_table"]
