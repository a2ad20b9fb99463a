"""Structured Streaming operators (syslog parity + windowed extras)."""
