"""Filled in by subsequent milestones."""
