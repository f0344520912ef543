from .pub_tracker import PubTracker, greedy_assignment, track_detections
