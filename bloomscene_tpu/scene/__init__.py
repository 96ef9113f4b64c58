"""Scene layer: cameras, trajectories, dataset assembly, pose noise."""
