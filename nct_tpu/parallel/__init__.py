"""Multi-chip execution: device meshes and sharded batch transfer."""
