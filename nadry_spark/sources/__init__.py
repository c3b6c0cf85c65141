"""Nadry-Search-Engine-BE rebuilt PySpark-native."""
