"""CLI entry points (console scripts in pyproject.toml).

Each module is also runnable directly: ``python tools/train.py ...``.
"""
