"""Operator tools: image diff, animation batch driver, CLI."""
