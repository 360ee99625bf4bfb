"""Pipeline state: checkpoint manifests and resume logic."""
