"""Remote-viewer protocol server (SIBR-compatible)."""
