from .app import BrainTumorApp, create_server
from .jobs import (TrainingJobManager, get_web_training_progress,
                   start_web_training, stop_web_training,
                   training_manager)
from .reports import calculate_medical_metrics, generate_clinical_report

__all__ = [
    "BrainTumorApp", "create_server", "TrainingJobManager",
    "get_web_training_progress", "start_web_training",
    "stop_web_training", "training_manager",
    "calculate_medical_metrics", "generate_clinical_report",
]
