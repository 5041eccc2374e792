"""Runnable definitions of the five BASELINE benchmark configs [B:7–B:11]
(SURVEY.md §5.6). Each entry fully specifies one config; ``examples/`` and
``benchmarks/`` consume these, and tests/test_configs.py runs reduced
versions end-to-end."""

from configs.registry import CONFIGS, get_config
