"""Query plans: the driver-facing registry plus plan-level utilities."""
