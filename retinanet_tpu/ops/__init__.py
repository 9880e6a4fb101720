"""Core static-shape ops: box geometry, anchors, assignment, losses, NMS."""
