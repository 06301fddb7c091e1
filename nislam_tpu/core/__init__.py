"""SLAM core: SE(2) algebra, camera model, state, tracker, back end."""
