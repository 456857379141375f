"""End-to-end pipeline plans: compose, checkpointed/resumable run, lineage."""
