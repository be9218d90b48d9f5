"""Low-level numeric ops shared by all pipeline stages."""
