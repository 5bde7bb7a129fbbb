"""Ingest adapters: driver-side REST fetch → DataFrame boundaries."""
