from .frechet import frechet_distance, activation_statistics

__all__ = ["frechet_distance", "activation_statistics"]
