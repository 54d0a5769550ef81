"""Training-export sinks: distributed writers that turn a curated
corpus DataFrame into the artifact a trainer actually ingests
(WebDataset tar shards), plus the matching read-back sources for
audit/roundtrip."""
