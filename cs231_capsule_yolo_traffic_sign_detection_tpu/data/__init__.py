"""Data subsystem: offline builders (GTSRB/GTSDB artifacts) and the
online loader (pickle/npy ingest, synthetic fallback, host utils)."""

from . import build, loader  # noqa: F401
