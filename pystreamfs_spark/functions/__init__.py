from pystreamfs_spark.functions.features import featurize_turns, N_FEATURES

__all__ = ["featurize_turns", "N_FEATURES"]
