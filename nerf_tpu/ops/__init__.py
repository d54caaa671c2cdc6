"""Math ops: encoders, samplers, compositing, cameras."""
