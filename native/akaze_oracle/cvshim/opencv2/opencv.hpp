#pragma once
#include "../cvshim.hpp"
