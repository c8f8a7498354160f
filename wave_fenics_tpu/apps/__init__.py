"""Application drivers (the reference's demo mains, productionized)."""
