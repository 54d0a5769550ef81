"""Sources and sinks: testdata loaders, the deterministic synthetic clips
generator, and the checkpoint/lineage layer."""
