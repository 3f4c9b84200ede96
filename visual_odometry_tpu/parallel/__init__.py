"""Multi-chip surface: device meshes, sharded matching, distributed BA."""
