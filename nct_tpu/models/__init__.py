"""Model definitions (VGG-19 feature backbone + weight tooling)."""
