"""Constant-velocity Kalman filter for box propagation (unitrack-style,
`MaXTron_Tube-Link/tracker/unitrack/`): state = (cx, cy, a, h, vx, vy, va,
vh), measurement = (cx, cy, a, h); chi-square gating distance included."""
from __future__ import annotations

import numpy as np

CHI2INV95 = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877}


class KalmanFilter:
    def __init__(self):
        ndim, dt = 4, 1.0
        self._F = np.eye(2 * ndim)
        for i in range(ndim):
            self._F[i, ndim + i] = dt
        self._H = np.eye(ndim, 2 * ndim)
        self._std_weight_position = 1.0 / 20
        self._std_weight_velocity = 1.0 / 160

    def initiate(self, measurement):
        mean = np.r_[measurement, np.zeros_like(measurement)]
        std = [
            2 * self._std_weight_position * measurement[3],
            2 * self._std_weight_position * measurement[3],
            1e-2,
            2 * self._std_weight_position * measurement[3],
            10 * self._std_weight_velocity * measurement[3],
            10 * self._std_weight_velocity * measurement[3],
            1e-5,
            10 * self._std_weight_velocity * measurement[3],
        ]
        return mean, np.diag(np.square(std))

    def predict(self, mean, covariance):
        std = [
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[3],
            1e-2,
            self._std_weight_position * mean[3],
            self._std_weight_velocity * mean[3],
            self._std_weight_velocity * mean[3],
            1e-5,
            self._std_weight_velocity * mean[3],
        ]
        q = np.diag(np.square(std))
        mean = self._F @ mean
        covariance = self._F @ covariance @ self._F.T + q
        return mean, covariance

    def project(self, mean, covariance):
        std = [
            self._std_weight_position * mean[3],
            self._std_weight_position * mean[3],
            1e-1,
            self._std_weight_position * mean[3],
        ]
        r = np.diag(np.square(std))
        return self._H @ mean, self._H @ covariance @ self._H.T + r

    def update(self, mean, covariance, measurement):
        proj_mean, proj_cov = self.project(mean, covariance)
        k = np.linalg.solve(proj_cov.T, (covariance @ self._H.T).T).T
        innovation = measurement - proj_mean
        new_mean = mean + k @ innovation
        new_cov = covariance - k @ proj_cov @ k.T
        return new_mean, new_cov

    def gating_distance(self, mean, covariance, measurements):
        proj_mean, proj_cov = self.project(mean, covariance)
        l = np.linalg.cholesky(proj_cov)
        d = measurements - proj_mean
        z = np.linalg.solve(l, d.T)
        return np.sum(z * z, axis=0)
