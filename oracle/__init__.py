"""CPU oracle of the reference semantics, used only by tests.

Brute-force (O(N^2)) re-implementations of what /root/reference computes, so
the Spark engine's sketch/join-based answers can be checked exactly at small
scale. Nothing in here is used by the engine itself.
"""
