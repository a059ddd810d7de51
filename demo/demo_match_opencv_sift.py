"""Classical SIFT baseline demo (reference demo/demo_match_opencv_sift.py
equivalent): OpenCV SIFT + ratio-test BF matching on the same image pair,
for eyeballing against the dense RoMa matches."""

import argparse

import cv2 as cv
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/toronto_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/toronto_B.jpg")
    p.add_argument("--save_path", default="demo/sift_matches.png")
    args = p.parse_args()

    img1 = cv.imread(args.im_A_path, cv.IMREAD_GRAYSCALE)
    img2 = cv.imread(args.im_B_path, cv.IMREAD_GRAYSCALE)
    sift = cv.SIFT_create()
    kp1, des1 = sift.detectAndCompute(img1, None)
    kp2, des2 = sift.detectAndCompute(img2, None)
    matches = cv.BFMatcher().knnMatch(des1, des2, k=2)
    good = [[m] for m, n in matches if m.distance < 0.75 * n.distance]
    img3 = cv.drawMatchesKnn(
        img1, kp1, img2, kp2, good, None, matchColor=(255, 0, 0), flags=2
    )
    Image.fromarray(img3).save(args.save_path)
    print(f"{len(good)} ratio-test matches; saved {args.save_path}")


if __name__ == "__main__":
    main()
