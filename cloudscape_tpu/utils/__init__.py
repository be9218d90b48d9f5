"""Host-side utilities: asset IO, image metrics."""
