"""HTTP serving layer (reference: flood/service/)."""
