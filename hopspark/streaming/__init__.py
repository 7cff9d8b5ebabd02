"""Structured Streaming extensions.

The reference is batch-only — no watermarks, stream windows, or stateful
operators exist anywhere in its backend (SURVEY.md §2.10), so parity
requires nothing here. This package carries the optional extension surface
(§7.E): event-stream versions of the batch operators over `readStream`,
with watermarked tumbling/sliding windows. Populated in a later round;
the batch `events` table queries live in hopspark/operators/.
"""
