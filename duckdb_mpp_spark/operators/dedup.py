"""Placeholder — populated in the pipeline-operators milestone."""
