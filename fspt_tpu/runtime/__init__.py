"""Runtime layer: progressive renderer, checkpoint/resume, animation driver,
metrics — the re-design of the reference's browser orchestrator
(reference main.js tick/clear/uploadOutput)."""
